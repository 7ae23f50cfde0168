"""j40_tpu — a TPU-native JPEG XL decode engine.

A from-scratch JAX/XLA/Pallas implementation of a JPEG XL (ISO/IEC 18181)
decoder with the capabilities of the reference C implementation
``lifthrasiir/j40``: host-side bitstream/entropy/Modular decode feeding
TPU-resident VarDCT reconstruction (dequant, chroma-from-luma, IDCT, XYB→sRGB)
and restoration filters, with image groups sharded over a device mesh.
"""

__version__ = "0.1.0"

import os as _os

# On VMs whose kernels fault transparent hugepages in slowly (measured
# ~0.3 s per 2 MiB fault on Firecracker guests), numpy's MADV_HUGEPAGE on
# large mallocs turns every fresh canvas/plane allocation into seconds of
# first-touch stalls (an 8 s np.full for a 50 MB canvas).  Default it off;
# export NUMPY_MADVISE_HUGEPAGE=1 before importing to keep hugepages on
# hosts with a healthy THP path.  Effective only if numpy is not imported
# yet; the hot paths also prefer calloc-backed np.zeros for large buffers.
_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

from .errors import J40Error, ShortInput, Unsupported  # noqa: F401
