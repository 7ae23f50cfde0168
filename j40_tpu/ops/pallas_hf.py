"""On-chip VarDCT HF coefficient decode (DCT8 groups, single-cluster spec).

Extends the Pallas entropy kernel (ops/pallas_entropy.py — window hierarchy,
funnel bit window, shared-LUT lookups) with an in-kernel state machine that
walks the HF coefficient structure of a pass-group section (reference
j40.h:6888-7005): per 8x8 block, per channel in Y,X,B order, one
nonzero-count symbol then that many coefficient symbols, each scattered
through the coefficient order permutation.

Why this subset decodes without any context modelling on-chip: when the
coefficient code spec has a SINGLE CLUSTER (our encoder's emission,
encode/vardct_enc.py; common for cjxl's simpler streams), every context maps
to the same distribution, so the symbol sequence is context-free — the
block-context map, nonzero-neighbour predictions, and frequency buckets
(j40.h:6929-6992) affect only *which cluster* codes a symbol and can be
skipped entirely.  The structure walk is still needed to know how many
symbols exist and where each lands; it is ~30 extra vector ops per step.

Outputs per step: the signed coefficient value and its scatter index
(c_xyb * ncells + cell) * 64 + order[i], or -1 for non-coefficient steps;
an XLA scatter-add then materializes dense (L, 3, ncells, 64) planes that
feed the fused reconstruction kernel directly — no host round-trip.

Upload cost is the section BYTES (vs ~6 MB/Mpix of coefficient planes for
the pack-and-upload plan), which is what makes the device end-to-end plan
win through a slow host link.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_entropy import (
    DEFAULT_CFG,
    LANE,
    TEST_CFG,
    KernelCfg,
    _barrel_blocks,
    _bc_i32,
    _bc_u32,
    _consume,
    _interpret,
    _shared_lookup,
    _to_chunks,
    build_lane_inputs,
    spec_is_pallas_simple,
)

YXB2XYB = (1, 0, 2)


def _make_hf_kernel(wrows: int, n_lut_chunks: int, n_tok_chunks: int,
                    use_prefix: bool, prefix_width: int, cfg: KernelCfg,
                    ncells_max: int):
    import os
    ABL = os.environ.get("J40T_HF_ABL", "")
    n_word_blocks = wrows // 8
    # small-stream mode: the whole words block is narrow enough to barrel
    # the G window from it directly — the L2 level (and its refresh cost)
    # disappears.  Shift bound: wordpos stays <= wrows-240 words (the +256
    # row pad), so goff8 <= n_word_blocks - 30 - 8.
    small = wrows <= 512
    ROUND_SYMS = cfg.round_syms
    ROUNDS_PER_L2 = cfg.rounds_per_l2
    L2_PER_SEG = cfg.l2_per_seg
    SEG_SYMS = cfg.seg_syms
    u32 = jnp.uint32

    def kernel(words_ref, init_ref, ncells_ref, lut_ref, tok_ref, lsb_ref,
               order_ref, vals_ref, idxs_ref, st_out_ref,
               l2_ref, g_ref, st_ref):
        # init_ref/st_ref rows: 0 ANS state bits, 1 bit position,
        # 2 cell k, 3 cyxb, 4 nzrem, 5 i, 6 err — a resumable machine
        # snapshot (a second call continues where a too-small step budget
        # left off)
        i_seg = pl.program_id(0)

        def refresh_l2(l2base8):
            src = [words_ref[b * 8:(b + 1) * 8, :]
                   for b in range(n_word_blocks)]
            out = _barrel_blocks(src, 32, l2base8)
            for b in range(32):
                l2_ref[b * 8:(b + 1) * 8, :] = out[b]

        def refresh_g(goff8):
            if small:
                src = [words_ref[b * 8:(b + 1) * 8, :]
                       for b in range(n_word_blocks)]
            else:
                src = [l2_ref[b * 8:(b + 1) * 8, :] for b in range(32)]
            out = _barrel_blocks(src, 8, goff8)
            for b in range(8):
                g_ref[b * 8:(b + 1) * 8, :] = out[b]

        def assemble(bitpos, gbase):
            off = (bitpos >> 4) - gbase
            b0 = off >> 3
            r0 = off & 7
            pair = []
            for p in range(2):
                acc = None
                for b in range(8):
                    blk = g_ref[b * 8:(b + 1) * 8, :]
                    acc = blk if acc is None else jnp.where(
                        b0 + p == b, blk, acc)
                pair.append(acc)
            ws = []
            for j in range(4):
                r = r0 + j
                r8 = jnp.broadcast_to(r & 7, (8, LANE))
                g0 = jnp.take_along_axis(pair[0], r8, axis=0)[0:1, :]
                g1 = jnp.take_along_axis(pair[1], r8, axis=0)[0:1, :]
                ws.append(_bc_u32(jnp.where(r < 8, g0, g1)))
            w0, w1, w2, w3 = ws
            sh = bitpos & 15
            shu = sh.astype(u32)
            shc = ((32 - sh) & 31).astype(u32)
            lo = ((w0 | (w1 << 16)) >> shu) | jnp.where(
                sh > 0, w2 << shc, jnp.uint32(0))
            hi = ((w2 | (w3 << 16)) >> shu) & 0xFFFF
            return lo, hi

        def decode_one(state_u, bitpos, active, gbase):
            """One hybrid-int symbol per active lane (single cluster)."""
            lo, hi = assemble(bitpos, gbase)
            consumed = jnp.zeros((1, LANE), jnp.int32)
            if use_prefix:
                pat = _bc_i32(lo) & ((1 << prefix_width) - 1)
                e = _shared_lookup(lut_ref, n_lut_chunks, pat)
                length = jnp.where(active, e >> 16, 0)
                tok = e & 0xFFFF
                lo, hi = _consume(lo, hi, length)
                consumed = consumed + length
                new_state = state_u
            else:
                idx = _bc_i32(state_u & 0xFFF)
                p = _shared_lookup(lut_ref, n_lut_chunks, idx)
                tok = (p >> 24) & 0xFF
                freqf = (p >> 12) & 0xFFF
                freq = _bc_u32(jnp.where(freqf == 0, 4096, freqf))
                base = _bc_u32(p & 0xFFF)
                nstate = freq * (state_u >> 12) + base
                renorm = active & (nstate < (1 << 16))
                nstate = jnp.where(renorm, (nstate << 16) | (lo & 0xFFFF),
                                   nstate)
                k16 = jnp.where(renorm, 16, 0)
                lo, hi = _consume(lo, hi, k16)
                consumed = consumed + k16
                new_state = jnp.where(active, nstate, state_u)
            tok = jnp.where(active, tok, 0)
            tp = _shared_lookup(tok_ref, n_tok_chunks, tok)
            A = tp & 0x3FFF
            mb = jnp.where(active, (tp >> 14) & 0x1F, 0)
            tlo = (tp >> 19) & 0xFF
            mid = _bc_i32(lo & ((jnp.uint32(1) << mb.astype(u32)) - 1))
            consumed = consumed + mb
            value = (A << mb) | (mid << lsb_ref[:]) | tlo
            value = jnp.where(active, value, 0)
            bitpos = bitpos + jnp.where(active, consumed, 0)
            return new_state, bitpos, value

        def one_step(carry, gbase):
            state_u, bitpos, k, cyxb, nzrem, ii, err = carry
            active = (k < ncells_ref[:]) & (err == 0)
            state_u, bitpos, value = decode_one(state_u, bitpos, active,
                                                gbase)
            if ABL == "nomachine":
                return ((state_u, bitpos, k + 1, cyxb, nzrem, ii, err),
                        value, value)
            is_nz = nzrem == 0

            # -- nz phase (j40.h:6959-6967, DCT8: log_size = 6)
            nz = value
            nz_err = active & is_nz & (nz > 63)
            start_coeffs = is_nz & (nz > 0)

            # -- coeff phase (j40.h:6981-6992)
            half = value >> 1
            sval = jnp.where((value & 1) == 1, -half - 1, half)
            c_xyb = jnp.where(cyxb == 0, 1, jnp.where(cyxb == 1, 0, 2))
            if ABL == "noorder":
                opos = ii
            else:
                opos = _shared_lookup(order_ref, 1, cyxb * 64 + ii)
            sidx = (c_xyb * ncells_max + k) * 64 + opos
            hit = value != 0
            nzrem_c = nzrem - jnp.where(hit, 1, 0)
            ii_c = ii + 1
            coeff_err = active & ~is_nz & (ii_c >= 64) & (nzrem_c > 0)

            emit = active & ~is_nz
            out_val = jnp.where(emit, sval, 0)
            out_idx = jnp.where(emit, sidx, -1)

            # -- advance
            nzrem2 = jnp.where(is_nz, jnp.where(start_coeffs, nz, 0),
                               jnp.where(coeff_err, 0, nzrem_c))
            ii2 = jnp.where(is_nz, jnp.where(start_coeffs, 1, ii), ii_c)
            adv = active & ((is_nz & (nz == 0))
                            | (~is_nz & ((nzrem_c == 0) | coeff_err)))
            cyxb2 = jnp.where(adv, cyxb + 1, cyxb)
            wrap = cyxb2 == 3
            cyxb2 = jnp.where(wrap, 0, cyxb2)
            k2 = jnp.where(wrap, k + 1, k)
            err2 = err | jnp.where(nz_err | coeff_err, 1, 0)
            return ((state_u, bitpos, k2, cyxb2, nzrem2, ii2, err2),
                    out_val, out_idx)

        @pl.when(i_seg == 0)
        def _init():
            for row in range(7):
                st_ref[row:row + 1, :] = init_ref[row:row + 1, :]

        if ABL == "gut":
            # control: behave exactly like the plain entropy kernel
            state_u0 = _bc_u32(st_ref[0:1, :])
            bitpos0 = st_ref[1:2, :]

            def l2p(p, carry):
                state_u, bitpos = carry
                wordpos = bitpos >> 4
                l2base8 = jnp.zeros((1, LANE), jnp.int32) if small \
                    else (wordpos >> 3)
                if not small:
                    refresh_l2(l2base8)
                l2base = l2base8 << 3
                for r in range(ROUNDS_PER_L2):
                    wordpos = bitpos >> 4
                    goff8 = (wordpos - l2base) >> 3
                    refresh_g(goff8)
                    gbase = l2base + (goff8 << 3)
                    for ss in range(ROUND_SYMS):
                        local = (p * ROUNDS_PER_L2 + r) * ROUND_SYMS + ss
                        active = jnp.ones((1, LANE), jnp.bool_)
                        state_u, bitpos, value = decode_one(
                            state_u, bitpos, active, gbase)
                        vals_ref[pl.ds(local, 1), :] = value
                return state_u, bitpos

            state_u, bitpos = jax.lax.fori_loop(0, L2_PER_SEG, l2p,
                                                (state_u0, bitpos0))
            st_ref[0:1, :] = _bc_i32(state_u)
            st_ref[1:2, :] = bitpos
            idxs_ref[0:1, :] = bitpos  # touch so output isn't elided
            for row in range(8):
                st_out_ref[row:row + 1, :] = st_ref[row:row + 1, :]
            return

        carry0 = (_bc_u32(st_ref[0:1, :]), st_ref[1:2, :], st_ref[2:3, :],
                  st_ref[3:4, :], st_ref[4:5, :], st_ref[5:6, :],
                  st_ref[6:7, :])

        def l2_period(p, carry):
            state_u, bitpos = carry[0], carry[1]
            wordpos = bitpos >> 4
            l2base8 = jnp.zeros((1, LANE), jnp.int32) if small \
                else (wordpos >> 3)
            if not small:
                refresh_l2(l2base8)
            l2base = l2base8 << 3
            for r in range(ROUNDS_PER_L2):
                wordpos = carry[1] >> 4
                goff8 = (wordpos - l2base) >> 3
                refresh_g(goff8)
                gbase = l2base + (goff8 << 3)
                for s in range(ROUND_SYMS):
                    local = (p * ROUNDS_PER_L2 + r) * ROUND_SYMS + s
                    carry, out_val, out_idx = one_step(carry, gbase)
                    vals_ref[pl.ds(local, 1), :] = out_val
                    if ABL != "nostore2":
                        idxs_ref[pl.ds(local, 1), :] = out_idx
            return carry

        carry = jax.lax.fori_loop(0, L2_PER_SEG, l2_period, carry0)

        st_ref[0:1, :] = _bc_i32(carry[0])
        for row in range(1, 7):
            st_ref[row:row + 1, :] = carry[row]
        for row in range(7):
            st_out_ref[row:row + 1, :] = st_ref[row:row + 1, :]
        st_out_ref[7:8, :] = jnp.where(
            (carry[2] >= ncells_ref[:]) | (carry[6] != 0), 1, 0)  # finished

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "use_prefix", "prefix_width", "wrows",
                     "ncells_max", "cfg_key"))
def _decode_hf_pallas(words, init, ncells, lut, tok, lsb, order,
                      n_steps: int, use_prefix: bool, prefix_width: int,
                      wrows: int, ncells_max: int, cfg_key=None):
    if words.dtype == jnp.uint16:
        L, w16 = words.shape
        words = jnp.pad(words.astype(jnp.int32),
                        ((0, LANE - L), (0, wrows - w16))).T
    cfg = KernelCfg(*cfg_key) if cfg_key else DEFAULT_CFG
    SEG_SYMS = cfg.seg_syms
    nseg = -(-n_steps // SEG_SYMS)
    kernel = _make_hf_kernel(
        wrows=wrows, n_lut_chunks=lut.shape[0] // 8,
        n_tok_chunks=tok.shape[0] // 8, use_prefix=use_prefix,
        prefix_width=prefix_width, cfg=cfg, ncells_max=ncells_max)
    const = lambda i: (0, 0)
    vals, idxs, st = pl.pallas_call(
        kernel,
        grid=(nseg,),
        in_specs=[
            pl.BlockSpec((wrows, LANE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((lut.shape[0], LANE), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tok.shape[0], LANE), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANE), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((SEG_SYMS, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEG_SYMS, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANE), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nseg * SEG_SYMS, LANE), jnp.int32),
            jax.ShapeDtypeStruct((nseg * SEG_SYMS, LANE), jnp.int32),
            jax.ShapeDtypeStruct((8, LANE), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((256, LANE), jnp.int32),
            pltpu.VMEM((64, LANE), jnp.int32),
            pltpu.VMEM((8, LANE), jnp.int32),
        ],
        interpret=_interpret(),
    )(words, init, ncells, lut, tok, lsb, order)
    return vals, idxs, st


@functools.partial(jax.jit, static_argnames=("ncells_max",))
def _scatter_coeffs(vals, idxs, ncells_max: int):
    """(steps, LANE) value/idx pairs -> (LANE, 3, ncells, 64) f32 planes."""
    n = 3 * ncells_max * 64
    lanes = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    flat = jnp.where(idxs < 0, n * LANE, idxs * LANE + lanes).reshape(-1)
    dense = jnp.zeros(n * LANE + 1, jnp.float32)
    dense = dense.at[flat].add(vals.reshape(-1).astype(jnp.float32),
                               mode="drop")
    return (dense[: n * LANE].reshape(3, ncells_max, 64, LANE)
            .transpose(3, 0, 1, 2))


@functools.partial(
    jax.jit,
    static_argnames=("k_syms", "wseg", "n_outer_cap", "use_prefix",
                     "prefix_width", "ncells_max", "cfg_key"))
def _decode_hf_long(words_lw, init8, ncells, lut, tok, lsb, order,
                    k_syms: int, wseg: int, n_outer_cap: int,
                    use_prefix: bool, prefix_width: int, ncells_max: int,
                    cfg_key=None):
    """Windowed mode for sections too long for VMEM: an XLA scan slides
    per-lane windows (vmapped dynamic_slice over the HBM-resident streams)
    around the kernel, threading the machine snapshot through; a lax.cond
    skips the kernel entirely once every lane is finished, so the fixed
    scan length costs only cheap copies past the true end.  One dispatch;
    a single scatter-add materializes the dense planes at the end."""
    L, w16 = words_lw.shape
    words = jnp.pad(words_lw.astype(jnp.int32), ((0, LANE - L), (0, wseg)))

    def finished(st8):
        return (st8[2:3, :] >= ncells) | (st8[6:7, :] != 0)

    def work(st8):
        ws = st8[1:2, :] >> 4
        win = jax.vmap(
            lambda row, s: jax.lax.dynamic_slice(row, (s,), (wseg,))
        )(words, ws[0]).T
        init_seg = st8.at[1:2, :].add(-(ws << 4))
        vals, idxs, st2 = _decode_hf_pallas(
            win, init_seg, ncells, lut, tok, lsb, order,
            n_steps=k_syms, use_prefix=use_prefix,
            prefix_width=prefix_width, wrows=wseg,
            ncells_max=ncells_max, cfg_key=cfg_key)
        st2 = st2.at[1:2, :].add(ws << 4)
        return st2, vals[:k_syms], idxs[:k_syms]

    def skip(st8):
        return (st8, jnp.zeros((k_syms, LANE), jnp.int32),
                jnp.full((k_syms, LANE), -1, jnp.int32))

    def seg(st8, _):
        st2, vals, idxs = jax.lax.cond(
            jnp.all(finished(st8)), skip, work, st8)
        return st2, (vals, idxs)

    st8, (vb, ib) = jax.lax.scan(seg, init8, None, length=n_outer_cap)
    vb = vb.reshape(n_outer_cap * k_syms, LANE)
    ib = ib.reshape(n_outer_cap * k_syms, LANE)
    st8 = st8.at[7:8, :].set(finished(st8).astype(jnp.int32))
    return vb, ib, st8


def hf_spec_is_device_simple(spec) -> bool:
    """Single-cluster, LZ77-free coefficient spec (context-free symbols)."""
    return spec_is_pallas_simple(spec)


def decode_hf_dct8(streams, ncells, spec, orders_yxb, ncells_max: int,
                   cap_steps: int | None = None,
                   cfg: KernelCfg | None = None):
    """Decode <=128 DCT8-only pass-group sections sharing one single-cluster
    coefficient spec, entirely on device.

    streams: [(bytes, bit_offset)] per lane; ncells: 8x8 block count per
    lane; orders_yxb: (3, 64) int32 coefficient order per YXB channel slot.
    Returns (coeffs (L, 3, ncells_max, 64) f32 device array, state dict with
    final ANS states / bit positions / done / err flags as numpy)."""
    if cfg is None:
        cfg = TEST_CFG if _interpret() else DEFAULT_CFG
    L = len(streams)
    assert L <= LANE
    from .pallas_entropy import streams_fit_pallas

    segmented = not streams_fit_pallas(streams)
    k_syms = 10 * cfg.seg_syms
    inp = build_lane_inputs(streams, spec, segmented=segmented,
                            k_syms=k_syms)
    nc = np.zeros((1, LANE), np.int32)
    nc[0, :L] = np.asarray(ncells, np.int32)
    order_flat = np.zeros(192, np.int32)
    for cyxb in range(3):
        order_flat[cyxb * 64:(cyxb + 1) * 64] = orders_yxb[cyxb]
    if cap_steps is None:
        # initial estimate: 3 nz symbols per block + one symbol per stream
        # bit; clamped to the format's hard bound (one nz + <= 63 coeff
        # symbols per block-channel => 192 * ncells); the resume loop
        # covers any shortfall of the estimate
        nmax = int(max(ncells))
        bits = max(len(d) for d, _ in streams) * 8
        cap_steps = min(3 * nmax + bits + 64, 192 * nmax)
    if _interpret():
        # interpret-mode compile cost scales with the unrolled segment
        # count; lean on the resume loop instead of one big budget
        cap_steps = min(cap_steps, 4 * cfg.seg_syms)
    init = np.zeros((8, LANE), np.int32)
    init[:3] = inp["init"]

    words_j = jnp.asarray(inp["words"])
    lut_j = jnp.asarray(inp["lut"])
    tok_j = jnp.asarray(inp["tok"])
    lsb_j = jnp.asarray(inp["lsb"])
    order_j = jnp.asarray(_to_chunks(order_flat))
    nc_j = jnp.asarray(nc)

    if segmented:
        # shape-bucketed outer cap so recompiles stay rare
        n_outer_cap = 1
        while n_outer_cap * k_syms < cap_steps:
            n_outer_cap *= 2
        vals, idxs, st = _decode_hf_long(
            words_j, jnp.asarray(init), nc_j, lut_j, tok_j, lsb_j,
            order_j, k_syms=k_syms, wseg=inp["wseg"],
            n_outer_cap=n_outer_cap, use_prefix=inp["use_prefix"],
            prefix_width=inp["prefix_width"], ncells_max=ncells_max,
            cfg_key=cfg.key())
        coeffs = _scatter_coeffs(vals, idxs, ncells_max)
        stn = np.asarray(st)
        state = {
            "ans_state": stn[0, :L].astype(np.uint32),
            "bitpos": stn[1, :L],
            "err": stn[6, :L],
            "done": stn[7, :L],
        }
        return coeffs[:L], state

    coeffs = None
    for _attempt in range(64):
        n_steps = min(-(-cap_steps // cfg.seg_syms) * cfg.seg_syms,
                      128 * cfg.seg_syms)
        vals, idxs, st = _decode_hf_pallas(
            words_j, jnp.asarray(init), nc_j, lut_j, tok_j, lsb_j, order_j,
            n_steps=n_steps, use_prefix=inp["use_prefix"],
            prefix_width=inp["prefix_width"], wrows=inp["wrows"],
            ncells_max=ncells_max, cfg_key=cfg.key())
        part = _scatter_coeffs(vals, idxs, ncells_max)
        coeffs = part if coeffs is None else coeffs + part
        stn = np.asarray(st)
        if stn[7, :L].all():  # every lane finished (decoded or errored)
            break
        init = stn[:7].copy()  # resume from the machine snapshot
    state = {
        "ans_state": stn[0, :L].astype(np.uint32),
        "bitpos": stn[1, :L],
        "err": stn[6, :L],
        "done": stn[7, :L],
    }
    return coeffs[:L], state
