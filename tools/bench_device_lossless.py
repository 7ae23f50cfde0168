"""Head-to-head: device (TPU lockstep entropy+prediction) vs host C++ for
lossless modular decode of a >=64-group image.

The BASELINE north star asks for "rANS/prefix entropy decode ... run as a
Pallas per-group decode loop (256x256 groups sharded across chips)"; this
records the measured comparison between that device path
(`Decoder(backend="device")`, ops/device_entropy.py lockstep kernels) and
the host C++ path (`backend="numpy"` + native/core.cpp) on identical input
(reference section independence: j40.h:447, 7749-7776).

Writes one JSON line to stdout; run it alone (the TPU is single-tenant).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from j40_tpu.decode import Decoder
    from j40_tpu.encode.encoder import EncodeOptions, encode_modular

    rng = np.random.default_rng(99)
    img = (
        np.cumsum(np.cumsum(rng.integers(-2, 3, size=(SIZE, SIZE, 3)), 0), 1)
        % 200
        + 20
    ).astype(np.uint8)
    # global tree => sections share one code spec (cjxl -e2+ shape), which
    # is the Pallas kernel's batching premise; local-tree files take the
    # per-lane-LUT lax.scan fallback instead
    data = encode_modular(img, options=EncodeOptions(global_tree=True))
    ngroups = ((SIZE + 255) // 256) ** 2
    print(f"# {SIZE}x{SIZE}, {ngroups} groups, {len(data)} bytes",
          file=sys.stderr)

    results = {}
    ref_px = None
    for backend, workers in (("numpy", 8), ("numpy", 1), ("device", 8)):
        key = f"{backend}-w{workers}"

        def once():
            d = Decoder(data, backend=backend, workers=workers)
            d.decode_frame()
            return d, d.render_rgba8()

        t0 = time.perf_counter()
        d, px = once()  # warmup/compile
        warm = time.perf_counter() - t0
        if backend == "device":
            dm = d.stats.get("device_modular", {})
            assert dm.get("lanes", 0) >= ngroups, (
                f"device path covered only {dm.get('lanes')} of {ngroups}"
            )
            print(f"# device stats: {dm}", file=sys.stderr)
        if ref_px is None:
            ref_px = px
        else:
            assert np.array_equal(px, ref_px), f"{key} mismatch vs host"
        dt = float("inf")
        for _ in range(ITERS):
            t0 = time.perf_counter()
            once()
            dt = min(dt, time.perf_counter() - t0)
        results[key] = SIZE * SIZE / dt / 1e6
        print(f"# {key}: {results[key]:.2f} Mpix/s (warmup {warm:.1f}s)",
              file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"lossless {SIZE}x{SIZE} ({ngroups} groups) Mpix/s",
                "host_cxx_8t": round(results["numpy-w8"], 3),
                "host_cxx_1t": round(results["numpy-w1"], 3),
                "device": round(results["device-w8"], 3),
                "device_vs_host_1t": round(
                    results["device-w8"] / results["numpy-w1"], 3
                ),
                "bit_exact": True,
            }
        )
    )


if __name__ == "__main__":
    main()
