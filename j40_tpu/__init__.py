"""j40_tpu — a TPU-native JPEG XL decode engine.

A from-scratch JAX/XLA/Pallas implementation of a JPEG XL (ISO/IEC 18181)
decoder with the capabilities of the reference C implementation
``lifthrasiir/j40``: host-side bitstream/entropy/Modular decode feeding
TPU-resident VarDCT reconstruction (dequant, chroma-from-luma, IDCT, XYB→sRGB)
and restoration filters, with image groups sharded over a device mesh.
"""

__version__ = "0.1.0"

from .errors import J40Error, ShortInput, Unsupported  # noqa: F401
