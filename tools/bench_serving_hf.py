"""Serving A/B on real TPU: on-chip HF entropy decode vs host-entropy+upload.

Decodes a uniform batch of VarDCT images three ways — host batch
(decode_batch), device batch with host entropy + packed coefficient upload
(decode_batch_device), and device batch with ON-CHIP HF entropy decode
(decode_batch_device_hf) — verifies the two device paths agree exactly, and
reports aggregate Mpix/s + upload byte accounts.

Usage: python tools/bench_serving_hf.py [n_images] [size] [iters]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 512
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 2


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct
    from concurrent.futures import ThreadPoolExecutor

    from j40_tpu.decode import Decoder
    from j40_tpu.parallel.batch import (
        decode_batch_device, decode_batch_device_hf)

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    blobs = []
    for i in range(N):
        base = (96 + 60 * np.sin(xx / (31.0 + i % 7)) *
                np.cos(yy / (23.0 + i % 5))
                + 40 * np.sin((xx + yy) / (71.0 + i % 11)))
        img = np.stack([
            base + 10 * np.sin(xx / (9.0 + 2 * c)) +
            rng.normal(0, 0.7, size=(SIZE, SIZE))
            for c in range(3)
        ], axis=-1).clip(0, 255).astype(np.uint8)
        blobs.append(encode_vardct(img, VarDCTOptions(use_prefix=False)))
    total_mp = N * SIZE * SIZE / 1e6
    total_bytes = sum(len(b) for b in blobs)
    print(f"# {N} x {SIZE}^2 = {total_mp:.1f} MP, {total_bytes/1e6:.1f} MB",
          file=sys.stderr)

    results = {}

    st = {}
    ref = decode_batch_device(blobs, workers=8, fetch=True, stats_out=st)
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        decode_batch_device(blobs, workers=8, fetch=False, stats_out=st)
        best = min(best, time.perf_counter() - t0)
    results["device_pack"] = {
        "mpixps": round(total_mp / best, 2),
        "upload_MB": round(st["upload_bytes"] / 1e6, 1)}
    print(f"# device_pack: {results['device_pack']}", file=sys.stderr)

    st2 = {}
    got = decode_batch_device_hf(blobs, workers=8, fetch=True,
                                 stats_out=st2)
    assert np.array_equal(got, ref), "on-chip HF path differs!"
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        decode_batch_device_hf(blobs, workers=8, fetch=False,
                               stats_out=st2)
        best = min(best, time.perf_counter() - t0)
    results["device_hf"] = {
        "mpixps": round(total_mp / best, 2),
        "upload_MB": round(st2["upload_bytes"] / 1e6, 1),
        "lf_s": round(st2["lf_s"], 3), "launch_s": round(st2["launch_s"], 3)}
    print(f"# device_hf: {results['device_hf']}", file=sys.stderr)

    def host_one(b):
        d = Decoder(b, backend="numpy")
        d.decode_frame()
        return d.render_rgba8()

    ex = ThreadPoolExecutor(max_workers=8)
    list(ex.map(host_one, blobs[:2]))  # warm
    t0 = time.perf_counter()
    list(ex.map(host_one, blobs))
    host_s = time.perf_counter() - t0
    ex.shutdown()
    results["host"] = {"mpixps": round(total_mp / host_s, 2)}

    print(json.dumps({
        "metric": "vardct serving aggregate Mpix/s (device-resident RGBA)",
        "images": N, "px": SIZE, "exact_match": True, **{
            k: v for k, v in results.items()}}))


if __name__ == "__main__":
    main()
