"""Mosaic gather microbenchmarks: which per-lane dynamic-index forms lower,
and at what cost per op.

The on-chip entropy decoder (reference j40.h:2804-2876 symbol loop,
j40.h:2441-2461 rANS step) needs, per decoded symbol per lane:
  - 1-2 stream-word fetches  words[pos_l]      (pos_l data-dependent)
  - 1-2 alias-LUT lookups    lut[state_l & 0xFFF]
  - 2-3 token-LUT lookups    tok_lut[token_l]
All are "gather a shared (or per-lane) table at a per-lane index" — the one
primitive TPUs lack as hardware scatter/gather over HBM, but which Mosaic
may lower over VMEM as sublane/lane dynamic gathers or select trees.  This
script measures every plausible spelling so the kernel design is driven by
measured per-op cost, not guesses.

Usage:  python tools/exp_pallas_gather.py            # on the TPU host
Writes one JSON line per variant.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 2048  # in-kernel loop iterations


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    return dt / K * 1e9  # ns per in-kernel iteration


def bench(name, build):
    try:
        fn, args = build()
        ns = timeit(fn, *args)
        print(json.dumps({"variant": name, "ns_per_iter": round(ns, 2)}),
              flush=True)
    except Exception as e:  # lowering failures are data, not errors
        msg = str(e).split("\n")[0][:200]
        print(json.dumps({"variant": name, "error": msg}), flush=True)


# ---------------------------------------------------------------- variants


def v_sublane_gather(N, SUB=8, LANE=128):
    """out[0, l] = tbl[idx[0, l], l]  — per-lane gather along axis 0."""
    def kernel(tbl_ref, idx0_ref, out_ref):
        tbl = tbl_ref[:]

        def body(i, idx):
            v = jnp.take_along_axis(tbl, idx, axis=0)
            return (idx + v) % N

        out_ref[:] = jax.lax.fori_loop(0, K, body, idx0_ref[:])

    def build():
        tbl = jnp.asarray(
            np.random.randint(1, N, size=(N, LANE), dtype=np.int32))
        idx0 = jnp.asarray(
            np.random.randint(0, N, size=(SUB, LANE), dtype=np.int32))
        fn = jax.jit(lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i))
        return fn, (tbl, idx0)

    return build


def v_lane_gather(SUB=8, LANE=128):
    """out[s, l] = tbl[s, idx[s, l]] — gather along the lane dim."""
    def kernel(tbl_ref, idx0_ref, out_ref):
        tbl = tbl_ref[:]

        def body(i, idx):
            v = jnp.take_along_axis(tbl, idx, axis=1)
            return (idx + v) % LANE

        out_ref[:] = jax.lax.fori_loop(0, K, body, idx0_ref[:])

    def build():
        tbl = jnp.asarray(
            np.random.randint(1, LANE, size=(SUB, LANE), dtype=np.int32))
        idx0 = jnp.asarray(
            np.random.randint(0, LANE, size=(SUB, LANE), dtype=np.int32))
        fn = jax.jit(lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i))
        return fn, (tbl, idx0)

    return build


def v_flat_take(N, SUB=8, LANE=128):
    """out[s, l] = tbl1d[idx[s, l]] — arbitrary flat table lookup."""
    def kernel(tbl_ref, idx0_ref, out_ref):
        tbl = tbl_ref[0]  # (N,) from (1, N)

        def body(i, idx):
            v = jnp.take(tbl, idx)
            return (idx + v) % N

        out_ref[:] = jax.lax.fori_loop(0, K, body, idx0_ref[:])

    def build():
        tbl = jnp.asarray(
            np.random.randint(1, N, size=(1, N), dtype=np.int32))
        idx0 = jnp.asarray(
            np.random.randint(0, N, size=(SUB, LANE), dtype=np.int32))
        fn = jax.jit(lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i))
        return fn, (tbl, idx0)

    return build


def v_chunked_lane_gather(N, SUB=8, LANE=128):
    """Flat N-entry lookup as N/LANE lane-gathers + selects.

    tbl stored (N//LANE, LANE); hi = idx >> 7 picks the chunk, lo = idx & 127
    lane-gathers within it.  Cost should scale with N/LANE."""
    C = N // LANE

    def kernel(tbl_ref, idx0_ref, out_ref):
        rows = [jnp.broadcast_to(tbl_ref[c][None, :], (SUB, LANE))
                for c in range(C)]

        def body(i, idx):
            hi = idx >> 7
            lo = idx & 127
            acc = jnp.zeros((SUB, LANE), jnp.int32)
            for c in range(C):
                g = jnp.take_along_axis(rows[c], lo, axis=1)
                acc = jnp.where(hi == c, g, acc)
            return (idx + acc) % N

        out_ref[:] = jax.lax.fori_loop(0, K, body, idx0_ref[:])

    def build():
        tbl = jnp.asarray(
            np.random.randint(1, N, size=(C, LANE), dtype=np.int32))
        idx0 = jnp.asarray(
            np.random.randint(0, N, size=(SUB, LANE), dtype=np.int32))
        fn = jax.jit(lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i))
        return fn, (tbl, idx0)

    return build


def v_onehot_matmul(N, L=256):
    """Lookup via two-level one-hot + MXU: N = A*B, idx = hi*B + lo.
    tmp = onehot_lo (L,B) @ tbl.T (B,A) -> (L,A) ; out = sum_h onehot_hi*tmp."""
    A = int(np.sqrt(N))
    while N % A:
        A -= 1
    B = N // A

    def kernel(tbl_ref, idx0_ref, out_ref):
        tbl = tbl_ref[:]  # (A, B) float32
        ia = jax.lax.broadcasted_iota(jnp.int32, (L, A), 1)
        ib = jax.lax.broadcasted_iota(jnp.int32, (L, B), 1)

        def body(i, idx):
            hi = idx // B
            lo = idx % B
            oh_lo = (ib == lo[:, 0:1]).astype(jnp.float32)
            tmp = jax.lax.dot_general(
                oh_lo, tbl, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            oh_hi = (ia == hi[:, 0:1]).astype(jnp.float32)
            v = jnp.sum(tmp * oh_hi, axis=1, keepdims=True).astype(jnp.int32)
            return (idx + v) % N

        out_ref[:] = jax.lax.fori_loop(0, K, body, idx0_ref[:])

    def build():
        tbl = jnp.asarray(
            np.random.randint(1, N, size=(A, B)).astype(np.float32))
        idx0 = jnp.asarray(
            np.random.randint(0, N, size=(L, 1), dtype=np.int32))
        fn = jax.jit(lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i))
        return fn, (tbl, idx0)

    return build


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    for N in (8, 32, 256, 2048, 8192):
        bench(f"sublane_gather_N{N}", v_sublane_gather(N))
    bench("lane_gather", v_lane_gather())
    for N in (1024, 4096, 32768):
        bench(f"flat_take_N{N}", v_flat_take(N))
    for N in (1024, 4096):
        bench(f"chunked_lane_gather_N{N}", v_chunked_lane_gather(N))
    for N in (4096,):
        bench(f"onehot_matmul_N{N}", v_onehot_matmul(N))


if __name__ == "__main__":
    main()
