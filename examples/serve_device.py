"""Serving example: decode JPEG XL straight into a jax model's device input.

The point of `render_rgba8_device()` is that the decoded pixels never leave
the chip: VarDCT reconstruction runs as one fused Pallas kernel producing
uint8 RGBA planes on the device, the canvas assembles on the device, and
the "model" below consumes it without a host round-trip.

Run:  python examples/serve_device.py  (uses a synthetic test image)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from j40_tpu.decode import Decoder
from j40_tpu.encode.vardct_enc import encode_vardct


@jax.jit
def toy_model(rgba_u8):
    """Stand-in for an inference model: global-average-pool the RGB."""
    x = rgba_u8[..., :3].astype(jnp.float32) / 255.0
    return x.mean(axis=(0, 1))


def main() -> None:
    rng = np.random.default_rng(0)
    img = (
        np.cumsum(rng.integers(-2, 3, size=(512, 512, 3)), axis=1) % 200 + 20
    ).astype(np.uint8)
    blob = encode_vardct(img)

    dec = Decoder(blob, backend="jax", keep_device_output=True)
    dec.decode_frame()
    t0 = time.perf_counter()
    rgba_dev = dec.render_rgba8_device()  # (h, w, 4) u8, device-resident
    feat = toy_model(rgba_dev)            # stays on-chip
    feat.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"device: {rgba_dev.shape} {rgba_dev.dtype} on {list(rgba_dev.devices())[0]}")
    print(f"model output {np.asarray(feat)} in {dt*1e3:.1f} ms after decode")


if __name__ == "__main__":
    main()
