"""Round 2: marginal per-gather cost (chained gathers per loop iteration),
lane-count scaling, and full prototype ANS-step cost.  See
exp_pallas_gather.py for context."""

from __future__ import annotations

import json
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 4096


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e9


def bench(name, build):
    try:
        fn, args = build()
        ns = timeit(fn, *args)
        print(json.dumps({"variant": name, "ns_per_iter": round(ns, 2)}),
              flush=True)
    except Exception:
        msg = traceback.format_exc().strip().split("\n")[-1][:300]
        print(json.dumps({"variant": name, "error": msg}), flush=True)


def pcall(kernel, out_sd, n_in):
    return lambda *a: pl.pallas_call(
        kernel,
        out_shape=out_sd,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*a)


def v_chained_lane_gather(G, SUB=8, LANE=128):
    """G dependent lane-gathers per iteration; marginal cost = slope."""
    def kernel(tbl_ref, idx0_ref, out_ref):
        tbl = tbl_ref[:]

        def body(i, idx):
            for _ in range(G):
                idx = jnp.take_along_axis(tbl, idx, axis=1)
            return idx

        out_ref[:] = jax.lax.fori_loop(0, K, body, idx0_ref[:])

    def build():
        tbl = jnp.asarray(
            np.random.randint(0, LANE, size=(SUB, LANE), dtype=np.int32))
        idx0 = jnp.asarray(
            np.random.randint(0, LANE, size=(SUB, LANE), dtype=np.int32))
        fn = jax.jit(pcall(kernel,
                           jax.ShapeDtypeStruct((SUB, LANE), jnp.int32), 2))
        return fn, (tbl, idx0)

    return build


def v_chained_chunked(G, N, SUB=8, LANE=128):
    """G dependent flat-N lookups per iteration via chunked lane gather."""
    C = N // LANE

    def kernel(tbl_ref, idx0_ref, out_ref):
        rows = [jnp.broadcast_to(tbl_ref[c][None, :], (SUB, LANE))
                for c in range(C)]

        def lookup(idx):
            hi = idx >> 7
            lo = idx & 127
            acc = jnp.zeros((SUB, LANE), jnp.int32)
            for c in range(C):
                g = jnp.take_along_axis(rows[c], lo, axis=1)
                acc = jnp.where(hi == c, g, acc)
            return acc

        def body(i, idx):
            for _ in range(G):
                idx = lookup(idx)
            return idx

        out_ref[:] = jax.lax.fori_loop(0, K, body, idx0_ref[:])

    def build():
        tbl = jnp.asarray(
            np.random.randint(0, N, size=(C, LANE), dtype=np.int32))
        idx0 = jnp.asarray(
            np.random.randint(0, N, size=(SUB, LANE), dtype=np.int32))
        fn = jax.jit(pcall(kernel,
                           jax.ShapeDtypeStruct((SUB, LANE), jnp.int32), 2))
        return fn, (tbl, idx0)

    return build


def v_chained_vreg_gather(G, N, SUB=8, LANE=128):
    """Flat-N lookup, 1024 entries per chunk: lane-gather by lo7, then
    sublane-gather (N<=8 works) by mid3, select by hi.  C = N/1024 chunks."""
    C = N // (8 * LANE)

    def kernel(tbl_ref, idx0_ref, out_ref):
        # tbl (C*8, LANE): chunk c rows [8c, 8c+8)
        def lookup(idx):
            lo = idx & 127
            mid = (idx >> 7) & 7
            hi = idx >> 10
            acc = jnp.zeros((SUB, LANE), jnp.int32)
            for c in range(C):
                chunk = tbl_ref[c * 8:(c + 1) * 8, :]
                g = jnp.take_along_axis(chunk, lo, axis=1)  # (8,128)? idx(8,128)
                g2 = jnp.take_along_axis(g, mid, axis=0)
                acc = jnp.where(hi == c, g2, acc)
            return acc

        def body(i, idx):
            for _ in range(G):
                idx = lookup(idx)
            return idx

        out_ref[:] = jax.lax.fori_loop(0, K, body, idx0_ref[:])

    def build():
        tbl = jnp.asarray(
            np.random.randint(0, N, size=(C * 8, LANE), dtype=np.int32))
        idx0 = jnp.asarray(
            np.random.randint(0, N, size=(SUB, LANE), dtype=np.int32))
        fn = jax.jit(pcall(kernel,
                           jax.ShapeDtypeStruct((SUB, LANE), jnp.int32), 2))
        return fn, (tbl, idx0)

    return build


def v_sublane_gather_big(N, SUB=8, LANE=128):
    """Retry sublane gather N>8 capturing the real error."""
    def kernel(tbl_ref, idx0_ref, out_ref):
        tbl = tbl_ref[:]

        def body(i, idx):
            v = jnp.take_along_axis(tbl, idx[0:1, :], axis=0)
            return (idx + v) % N

        out_ref[:] = jax.lax.fori_loop(0, K, body, idx0_ref[:])

    def build():
        tbl = jnp.asarray(
            np.random.randint(1, N, size=(N, LANE), dtype=np.int32))
        idx0 = jnp.asarray(
            np.random.randint(0, N, size=(SUB, LANE), dtype=np.int32))
        fn = jax.jit(pcall(kernel,
                           jax.ShapeDtypeStruct((SUB, LANE), jnp.int32), 2))
        return fn, (tbl, idx0)

    return build


def v_lane_scaling(NV, G=4, LANE=128):
    """NV vregs of lanes (NV*1024 lanes): does gather cost scale linearly?"""
    SUB = 8 * NV

    def kernel(tbl_ref, idx0_ref, out_ref):
        tbl = tbl_ref[:]

        def body(i, idx):
            for _ in range(G):
                idx = jnp.take_along_axis(tbl, idx, axis=1)
            return idx

        out_ref[:] = jax.lax.fori_loop(0, K, body, idx0_ref[:])

    def build():
        tbl = jnp.asarray(
            np.random.randint(0, LANE, size=(SUB, LANE), dtype=np.int32))
        idx0 = jnp.asarray(
            np.random.randint(0, LANE, size=(SUB, LANE), dtype=np.int32))
        fn = jax.jit(pcall(kernel,
                           jax.ShapeDtypeStruct((SUB, LANE), jnp.int32), 2))
        return fn, (tbl, idx0)

    return build


def v_ans_step_proto(SUB=8, LANE=128, WTOT=4096):
    """Full prototype: one rANS symbol step per iteration.

    - alias LUT: 4096 entries, chunked vreg gather (fb packed, sym packed)
    - refill: stream words (WTOT, LANE) per lane... here emulated as a flat
      shared table gather at per-lane pos (the worst case: chunked over
      WTOT/1024 vreg chunks).
    """
    CL = 4096 // (8 * LANE)        # LUT chunks
    CW = WTOT // 8                  # word-table rows / 8

    def kernel(lutf_ref, luts_ref, words_ref, st0_ref, out_ref):
        def lut4096(ref, idx):
            lo = idx & 127
            mid = (idx >> 7) & 7
            hi = idx >> 10
            acc = jnp.zeros((SUB, LANE), jnp.int32)
            for c in range(CL):
                chunk = ref[c * 8:(c + 1) * 8, :]
                g = jnp.take_along_axis(chunk, lo, axis=1)
                g2 = jnp.take_along_axis(g, mid, axis=0)
                acc = jnp.where(hi == c, g2, acc)
            return acc

        def word_at(pos):
            # per-lane stream word: words (WTOT//?, LANE) column-per-lane
            # layout; gather along sublanes in chunks of 8
            lo8 = pos & 7
            hi = pos >> 3
            acc = jnp.zeros((SUB, LANE), jnp.int32)
            for c in range(CW):
                chunk = words_ref[c * 8:(c + 1) * 8, :]
                g = jnp.take_along_axis(chunk, lo8[0:1, :] % 8, axis=0)
                acc = jnp.where(hi == c, jnp.broadcast_to(g, (SUB, LANE)),
                                acc)
            return acc

        def body(i, carry):
            state, buf, cnt, pos = carry
            idx = (state & 0xFFF)
            fb = lut4096(lutf_ref, idx)
            sym = lut4096(luts_ref, idx)
            freq = fb >> 12
            base = fb & 0xFFF
            nstate = freq * (state >> 12) + base
            renorm = nstate < (1 << 16)
            w = word_at(pos)
            nstate = jnp.where(renorm, (nstate << 16) | (w & 0xFFFF), nstate)
            pos = jnp.where(renorm, pos + 1, pos)
            state = nstate
            return (state, buf + sym, cnt, pos % (WTOT - 8))

        st = st0_ref[:]
        carry = (st, jnp.zeros_like(st), jnp.zeros_like(st),
                 jnp.zeros_like(st))
        state, buf, cnt, pos = jax.lax.fori_loop(0, K, body, carry)
        out_ref[:] = state + buf + pos

    def build():
        lutf = jnp.asarray(np.random.randint(
            1 << 12, 1 << 24, size=(CL * 8, LANE), dtype=np.int32))
        luts = jnp.asarray(np.random.randint(
            0, 256, size=(CL * 8, LANE), dtype=np.int32))
        words = jnp.asarray(np.random.randint(
            0, 1 << 16, size=(WTOT, LANE), dtype=np.int32))
        st0 = jnp.asarray(np.random.randint(
            1 << 16, 1 << 30, size=(SUB, LANE), dtype=np.int32))
        fn = jax.jit(pcall(kernel,
                           jax.ShapeDtypeStruct((SUB, LANE), jnp.int32), 4))
        return fn, (lutf, luts, words, st0)

    return build


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    for G in (1, 4, 16):
        bench(f"chained_lane_gather_G{G}", v_chained_lane_gather(G))
    for G in (1, 4):
        bench(f"chained_chunked4096_G{G}", v_chained_chunked(G, 4096))
    for G in (1, 4):
        bench(f"chained_vreg4096_G{G}", v_chained_vreg_gather(G, 4096))
    bench("sublane_gather_N32_fix", v_sublane_gather_big(32))
    for NV in (1, 4, 8):
        bench(f"lane_scaling_NV{NV}_G4", v_lane_scaling(NV))
    for W in (1024, 4096):
        bench(f"ans_step_proto_W{W}", v_ans_step_proto(WTOT=W))


if __name__ == "__main__":
    main()
