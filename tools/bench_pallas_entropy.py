"""Measure the Pallas on-chip entropy kernel on real TPU hardware.

Reports device Msym/s for 128 shared-spec lanes (the VERDICT r3 item #1
artifact) with a correctness check vs the host oracle, and the host C++
symbol rate on the same streams for comparison.

Usage: python tools/bench_pallas_entropy.py [syms_per_lane] [iters]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

S = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
LANES = int(sys.argv[3]) if len(sys.argv) > 3 else 128


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from j40_tpu.encode.bitwriter import BitWriter
    from j40_tpu.encode.entropy import EntropyEncoder
    from j40_tpu.entropy.code import CodeState, read_code_spec
    from j40_tpu.io.bits import BitReader
    from j40_tpu.ops import pallas_entropy as pe

    rng = np.random.default_rng(42)
    # token distribution shaped like residual data (heavy zero mass)
    lanes = [
        np.minimum((rng.pareto(1.2, size=S) * 2).astype(np.int64), 60000)
        for _ in range(LANES)
    ]
    enc = EntropyEncoder(1, use_prefix=False)
    for l, v in enumerate(lanes):
        enc.add_array(0, v, stream=l)

    streams = []
    spec = None
    total_bytes = 0
    for l, v in enumerate(lanes):
        w = BitWriter()
        enc.write_spec(w)
        enc.write_tokens(w, stream=l)
        data = w.finish()
        r = BitReader(data)
        spec = read_code_spec(r, 1)
        streams.append((data, r.bits_consumed))
        total_bytes += len(data)
    assert pe.spec_is_pallas_simple(spec)
    nsym = [S] * LANES

    # host oracle rate (the pure-python oracle; C++ rate from BENCH numbers)
    r = BitReader(streams[0][0])
    read_code_spec(r, 1)
    code = CodeState(spec)
    t0 = time.perf_counter()
    host_first = [code.code(r, 0) for _ in range(min(S, 2000))]
    host_py_rate = min(S, 2000) / (time.perf_counter() - t0) / 1e6

    # device inputs built once (packing excluded from the kernel timing)
    inp = pe.build_lane_inputs(streams, spec)
    ns = np.zeros((1, pe.LANE), np.int32)
    ns[0, :LANES] = S
    args = [jnp.asarray(inp[k]) for k in ("words", "skip")]
    args.append(jnp.asarray(ns))
    args += [jnp.asarray(inp[k]) for k in ("lut", "tok", "lsb")]

    t0 = time.perf_counter()
    vals, st = pe._decode_pallas(
        *args, n_steps=S, use_prefix=inp["use_prefix"],
        prefix_width=inp["prefix_width"], wrows=inp["wrows"])
    jax.block_until_ready((vals, st))
    compile_s = time.perf_counter() - t0

    v0 = np.asarray(vals)
    assert list(v0[: len(host_first), 0]) == host_first, "device mismatch!"
    stn = np.asarray(st)
    assert (stn[0, :LANES].astype(np.uint32) == 0x130000).all(), \
        "final ANS state"

    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        vals, st = pe._decode_pallas(
            *args, n_steps=S, use_prefix=inp["use_prefix"],
            prefix_width=inp["prefix_width"], wrows=inp["wrows"])
        jax.block_until_ready((vals, st))
        best = min(best, time.perf_counter() - t0)

    total_syms = LANES * S
    print(json.dumps({
        "lanes": LANES,
        "syms_per_lane": S,
        "stream_bytes_per_lane": total_bytes // LANES,
        "wrows": inp["wrows"],
        "compile_s": round(compile_s, 1),
        "device_total_s": round(best, 4),
        "device_Msym_s": round(total_syms / best / 1e6, 2),
        "device_ns_per_sym_step": round(best / S * 1e9, 1),
        "host_python_Msym_s": round(host_py_rate, 3),
    }))


if __name__ == "__main__":
    main()
