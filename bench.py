"""Benchmark: VarDCT decode throughput (Mpix/s) vs the reference dj40.

Prints exactly one JSON line on stdout:
  {"metric": "...", "value": N, "unit": "Mpix/s", "vs_baseline": R}

vs_baseline is our Mpix/s divided by dj40's Mpix/s on the same file, measured
on this machine (the reference publishes no absolute numbers; BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
CACHE = Path("/tmp/j40_tpu_bench")
SIZE = int(os.environ.get("BENCH_SIZE", "256"))
ITERS = int(os.environ.get("BENCH_ITERS", "3"))


def _ensure_dj40() -> Path | None:
    exe = Path("/tmp/j40ref/dj40")
    if exe.exists():
        return exe
    ref = Path("/root/reference")
    if not ref.exists():
        return None
    d = Path("/tmp/j40ref")
    (d / "extra").mkdir(parents=True, exist_ok=True)
    for src in ("j40.h", "dj40.c"):
        (d / src).write_bytes((ref / src).read_bytes())
    (d / "extra/stb_image_write.h").write_bytes(
        (ref / "extra/stb_image_write.h").read_bytes()
    )
    r = subprocess.run(
        ["cc", "-O2", "-o", str(exe), str(d / "dj40.c"), "-lm"], capture_output=True
    )
    return exe if r.returncode == 0 else None


def _test_image(size: int) -> np.ndarray:
    rng = np.random.default_rng(12345)
    img = np.cumsum(np.cumsum(rng.integers(-2, 3, size=(size, size, 3)), 0), 1)
    return (img % 200 + 20).astype(np.uint8)


def main() -> None:
    sys.path.insert(0, str(REPO))
    from j40_tpu.decode import decode_file
    from j40_tpu.encode.vardct_enc import encode_vardct

    CACHE.mkdir(exist_ok=True)
    jxl_path = CACHE / f"bench_{SIZE}.jxl"
    if not jxl_path.exists():
        cs = encode_vardct(_test_image(SIZE))
        jxl_path.write_bytes(cs)
    data = jxl_path.read_bytes()

    backend = os.environ.get("BENCH_BACKEND", "jax")
    # warmup (includes jit compilation)
    _, rgba = decode_file(data, backend=backend)
    pixels = rgba.shape[0] * rgba.shape[1]

    t0 = time.perf_counter()
    for _ in range(ITERS):
        decode_file(data, backend=backend)
    dt = (time.perf_counter() - t0) / ITERS
    ours_mpix_s = pixels / dt / 1e6

    vs_baseline = 0.0
    dj40 = _ensure_dj40()
    if dj40 is not None:
        out_png = CACHE / "bench_ref.png"
        subprocess.run([str(dj40), str(jxl_path), str(out_png)], capture_output=True)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            subprocess.run(
                [str(dj40), str(jxl_path), str(out_png)], capture_output=True
            )
        ref_dt = (time.perf_counter() - t0) / ITERS
        ref_mpix_s = pixels / ref_dt / 1e6
        vs_baseline = ours_mpix_s / ref_mpix_s
        print(
            f"# ours: {ours_mpix_s:.3f} Mpix/s, dj40: {ref_mpix_s:.3f} Mpix/s",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": f"VarDCT decode throughput ({SIZE}x{SIZE}, backend={backend})",
                "value": round(ours_mpix_s, 4),
                "unit": "Mpix/s",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
