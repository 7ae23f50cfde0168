"""VarDCT device end-to-end on real TPU: on-chip HF entropy decode.

Validates full Decoder(backend="device") parity against the numpy oracle on
multi-group DCT8 VarDCT streams (the interpret-mode CI tests cover the
kernel at unit level; this is the hardware e2e), then measures:

- decode+render wall time for backend device vs numpy (vardct_device_e2e)
- the upload byte account: section bytes vs the coefficient-plane upload
  the previous device plan paid

Usage: python tools/bench_device_vardct.py [size] [iters]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from j40_tpu.decode import Decoder
    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct

    # photographic-like content (~1-2 bpp at these quant settings):
    # low-frequency structure + mild texture, not the noise-like cumsum
    # pattern (which stresses the worst case at ~17 bpp)
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    base = (
        96 + 60 * np.sin(xx / 37.0) * np.cos(yy / 29.0)
        + 40 * np.sin((xx + yy) / 83.0)
    )
    img = np.stack([
        base + 12 * np.sin(xx / (11.0 + 3 * c)) +
        rng.normal(0, 2.0, size=(SIZE, SIZE))
        for c in range(3)
    ], axis=-1).clip(0, 255).astype(np.uint8)
    data = encode_vardct(img, VarDCTOptions(use_prefix=False))
    ngroups = ((SIZE + 255) // 256) ** 2
    print(f"# {SIZE}x{SIZE} vardct, {ngroups} groups, {len(data)} bytes",
          file=sys.stderr)

    results = {}
    ref = None
    # exactness oracle is the jax backend (host entropy + the same device
    # reconstruction); numpy differs by the documented +-1 float-path
    # quantization and is reported for throughput reference only
    for backend in ("numpy", "jax", "device"):
        def once():
            d = Decoder(data, backend=backend, workers=8)
            d.decode_frame()
            return d, d.render_rgba8()

        t0 = time.perf_counter()
        d, px = once()
        warm = time.perf_counter() - t0
        if backend == "device":
            dv = d.stats.get("device_vardct", {})
            print(f"# device stats: {dv}", file=sys.stderr)
            assert dv.get("lanes", 0) >= ngroups, \
                f"device HF covered {dv.get('lanes')} of {ngroups}"
        if backend == "jax":
            ref = px
        elif backend == "device":
            assert np.array_equal(px, ref), "device output differs from jax"
        best = float("inf")
        for _ in range(ITERS):
            t0 = time.perf_counter()
            once()
            best = min(best, time.perf_counter() - t0)
        results[backend] = SIZE * SIZE / best / 1e6
        print(f"# {backend}: {results[backend]:.2f} Mpix/s "
              f"(warmup {warm:.1f}s)", file=sys.stderr)

    print(json.dumps({
        "metric": f"vardct {SIZE}x{SIZE} on-chip HF decode Mpix/s",
        "bytes": len(data),
        "host_numpy": round(results["numpy"], 3),
        "host_jax": round(results["jax"], 3),
        "device": round(results["device"], 3),
        "exact_match": True,
    }))


if __name__ == "__main__":
    main()
