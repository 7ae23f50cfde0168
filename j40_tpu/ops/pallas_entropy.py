"""On-chip entropy decode: the full rANS/prefix symbol loop as ONE Pallas
TPU kernel.

This is the device dual of the host symbol loop (reference j40.h:2804-2876,
rANS step j40.h:2441-2461) and the successor of ops/device_entropy.py's
`lax.scan` token decoder: where the scan pays ~20 us per dependent step in
dispatch + full-width XLA gathers (SCALING.md "the measured head-to-head"),
this kernel holds the whole token loop in VMEM and pays only vector-register
work per step.

Design (all shapes static at trace time):

- **128 lanes per call**, one independent per-section stream per lane
  (format guarantee: every TOC section is an isolated entropy stream,
  j40.h:447, 7749-7776).  All lanes share one code spec (one image's
  global/HF spec); the caller groups mixed-spec batches.
- **TPUs have no per-lane HBM gather**, so stream bytes are staged through a
  VMEM window hierarchy moved by compare+select trees in 8-row block units
  (a truncated barrel shifter over per-lane shift amounts):
  words (whole stream) -> L2 (256 rows, refreshed every 60 symbols) ->
  G (64 rows, every 12) -> a 48-bit per-symbol funnel window from 4 words.
- **LUT lookups** compose the two per-lane dynamic-gather forms Mosaic
  lowers fast: a lane-dim `take_along_axis` with a sublane-uniform index,
  then an 8-deep sublane gather, then a select across 1024-entry chunks.
  Valid because indices are kept (1, 128) and broadcast across sublanes.
- Bit-exact: integer only; the per-symbol consumed-bit sequence equals the
  host oracle's (entropy/code.py), so values, final bit positions, and the
  final ANS state (must be 0x130000, j40.h:2884-2891) all match.

Worst-case bit accounting (why the cadences are safe): one symbol consumes
at most 15 (prefix) or 16 (ANS renorm) plus MAX_MIDBITS=17 extra bits
<= 33 bits, so the 16-bit word position advances at most 3 per symbol.
Per 12-symbol round: <= 36 words, within G's 64 rows (initial offset < 8,
lookahead 4).  Per 60-symbol L2 period: <= 180+7 words, within L2's 256.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..entropy.code import CodeSpec
from .device_entropy import ans_luts, hybrid_luts

LANE = 128
MAX_MIDBITS = 17       # matches device_entropy refill discipline


class KernelCfg:
    """Static cadence config.  Safety invariant (see module doc): a symbol
    advances the 16-bit word position by at most 3, so
    round_syms * 3 + 8 + 4 <= 64 (G window) and
    rounds_per_l2 * round_syms * 3 + 7 + 64 <= 256 (L2 window)."""

    def __init__(self, round_syms=12, rounds_per_l2=5, l2_per_seg=4):
        assert round_syms * 3 + 12 <= 64
        assert rounds_per_l2 * round_syms * 3 + 71 <= 256
        self.round_syms = round_syms
        self.rounds_per_l2 = rounds_per_l2
        self.l2_per_seg = l2_per_seg
        self.seg_syms = round_syms * rounds_per_l2 * l2_per_seg

    def key(self):
        return (self.round_syms, self.rounds_per_l2, self.l2_per_seg)


DEFAULT_CFG = KernelCfg()
# tiny unroll for interpret-mode tests (compile cost scales with seg_syms)
TEST_CFG = KernelCfg(round_syms=4, rounds_per_l2=3, l2_per_seg=2)


def _interpret() -> bool:
    import os

    return (jax.default_backend() != "tpu"
            or os.environ.get("J40T_PALLAS") == "interp")


# ---------------------------------------------------------------- LUT packing


def pack_alias_lut(cluster) -> np.ndarray:
    """(4096,) int32: sym(8) << 24 | (freq & 0xFFF) << 12 | base(12).

    freq == 4096 (single-symbol distribution) is stored as freq field 0.
    Flattened alias table per j40.h:2441-2461; see device_entropy.ans_luts."""
    fb, sym = ans_luts(cluster)
    freq = fb.astype(np.int64) >> 12
    base = fb.astype(np.int64) & 0xFFF
    assert sym.max() <= 0xFF, "alias symbol exceeds 8 bits"
    packed = (sym.astype(np.int64) << 24) | ((freq & 0xFFF) << 12) | base
    assert packed.max() < (1 << 31)
    return packed.astype(np.int32)


def pack_alias_buckets(cluster) -> tuple[np.ndarray, int]:
    """Bucket-level alias records: (2*table_size,) int32 + log_bucket_size.

    Record i (bucket i of the alias map, j40.h:2441-2461):
      W0 = cutoff(13) | (freq_direct & 0xFFF) << 13
      W1 = offset(12) | (freq_alias & 0xFFF) << 12 | alias_symbol << 24
    freq fields use the 0 => 4096 convention.  Decode: slot = state & 0xFFF,
    i = slot >> log_bucket_size, pos = slot & (bucket_size - 1); direct when
    pos < cutoff (symbol = i, base = pos) else symbol = alias_symbol,
    base = offset + pos.  This is 16-64x smaller per spec than the flat
    4096-slot LUT (table_size = alphabet ceiling <= 256), which keeps the
    kernel's stacked-spec select chain short in multi-image serving calls."""
    D, aliases = cluster.D, cluster.aliases
    table_size = len(D)
    lbs = 12 - (table_size.bit_length() - 1)
    out = np.zeros(2 * table_size, np.int64)
    for i, b in enumerate(aliases):
        assert b.symbol <= 0xFF and 0 <= b.offset < 4096
        assert 0 <= b.cutoff <= 4096
        out[2 * i] = (b.cutoff & 0x1FFF) | ((D[i] & 0xFFF) << 13)
        out[2 * i + 1] = (b.offset | ((D[b.symbol] & 0xFFF) << 12)
                          | (b.symbol << 24))
    assert out.max() < (1 << 31)
    return out.astype(np.int32), lbs


def pack_prefix_lut(code, width: int) -> np.ndarray:
    """(2^width,) int32: len(5) << 16 | sym, indexed by the next `width`
    bits (LSB-first); canonical-prefix LUT per j40.h:2049-2242."""
    lut = np.full(1 << width, -1, np.int64)
    if code.single_symbol is not None:
        lut[:] = code.single_symbol  # length 0
    else:
        assert code.max_len <= width
        for length in range(1, code.max_len + 1):
            step = 1 << length
            for pattern, s in code.by_len[length].items():
                lut[pattern::step] = (length << 16) | s
    assert (lut >= 0).all(), "incomplete prefix code"
    assert lut.max() < (1 << 31)
    return lut.astype(np.int32)


def pack_token_lut(cfg, alpha_size: int) -> np.ndarray:
    """(alpha,) int32: lo(8) << 19 | mb(5) << 14 | A(14); hybrid-int config
    flattened (j40.h:2313-2327)."""
    mb, A, lo = hybrid_luts(cfg, alpha_size)
    assert A.max() < (1 << 14) and lo.max() < (1 << 8) and mb.max() <= 31
    packed = (lo.astype(np.int64) << 19) | (mb.astype(np.int64) << 14) | A
    return packed.astype(np.int32)


def spec_is_pallas_simple(spec: CodeSpec) -> bool:
    """Kernel eligibility: single cluster, no LZ77, packable LUTs."""
    if spec.lz77_enabled or spec.num_clusters != 1:
        return False
    cl = spec.clusters[0]
    cfg = cl.config
    if cfg.msb_in_token + cfg.lsb_in_token > 8:
        return False
    if spec.use_prefix_code:
        if cl.prefix.max_len > 13:
            return False
        if cl.prefix.single_symbol is not None:
            top = cl.prefix.single_symbol
        else:
            top = max(max(d.values()) for d in cl.prefix.by_len if d)
        alpha = top + 1
        if top > 0xFFFF:
            return False
    else:
        _, sym = ans_luts(cl)
        if sym.max() > 0xFF:
            return False
        alpha = int(max(t for t, f in enumerate(cl.D) if f > 0)) + 1
    split = 1 << cfg.split_exp
    if alpha - 1 >= split:
        bits = cfg.msb_in_token + cfg.lsb_in_token
        worst = cfg.split_exp - bits + ((alpha - 1 - split) >> bits)
        if worst > MAX_MIDBITS:
            return False
    try:
        pack_token_lut(cfg, alpha)
    except AssertionError:
        return False
    return True


def _to_chunks(flat: np.ndarray) -> np.ndarray:
    """(N,) table -> (ceil(N/1024)*8, 128): entry e at row e>>7, col e&127."""
    n = len(flat)
    rows8 = -(-(-(-n // 128)) // 8) * 8
    out = np.zeros(rows8 * 128, flat.dtype)
    out[:n] = flat
    return out.reshape(rows8, 128)


# ---------------------------------------------------------------- kernel bits


def _bc_u32(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _bc_i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _shared_lookup(chunks_ref, n_chunks: int, idx):
    """tbl[idx] for a shared flat table in chunk layout; idx (1, 128) int32.

    Per chunk: ONE lane-gather (the expensive op), then select by the
    per-lane chunk id; a single 8-deep sublane gather at the end resolves
    the row (entry e at row e>>7, col e&127).  The chunk select must come
    AFTER the lane-gather — the gather reads a different column than the
    reading lane, so any per-lane selection applied pre-gather would mix
    specs (column c's data selected by lane c's id but read by lane l)."""
    lo = jnp.broadcast_to(idx & 127, (8, LANE))
    mid = (idx >> 7) & 7
    hi = idx >> 10
    acc = None
    for c in range(n_chunks):
        chunk = chunks_ref[c * 8:(c + 1) * 8, :]
        g = jnp.take_along_axis(chunk, lo, axis=1)
        acc = g if acc is None else jnp.where(hi == c, g, acc)
    mid8 = jnp.broadcast_to(mid, (8, LANE))
    return jnp.take_along_axis(acc, mid8, axis=0)[0:1, :]


def _col_lookup(tbl_ref, n_blocks: int, ridx):
    """tbl[ridx[l], l] for a PER-LANE column-layout table; ridx (1, 128).

    Column l holds lane l's own table (row r = entry r), so every op stays
    within its column: per-lane whole-block selects are valid here (unlike
    the shared chunk layout, where the lane-gather crosses columns), and
    the lookup is n_blocks cheap selects + ONE 8-deep sublane gather.
    Cost is independent of how many distinct specs a call stacks — the
    layout that makes 128-spec serving batches decode at single-spec
    speed."""
    blk_id = ridx >> 3
    acc = None
    for b in range(n_blocks):
        blk = tbl_ref[b * 8:(b + 1) * 8, :]
        acc = blk if acc is None else jnp.where(blk_id == b, blk, acc)
    r8 = jnp.broadcast_to(ridx & 7, (8, LANE))
    return jnp.take_along_axis(acc, r8, axis=0)[0:1, :]


def _col_block(tbl_ref, n_blocks: int, blk_id):
    """The selected (8, LANE) block of a column-layout table (for reading
    several rows of the same block with one select chain)."""
    acc = None
    for b in range(n_blocks):
        blk = tbl_ref[b * 8:(b + 1) * 8, :]
        acc = blk if acc is None else jnp.where(blk_id == b, blk, acc)
    return acc


def _col_row(blk, ridx):
    r8 = jnp.broadcast_to(ridx & 7, (8, LANE))
    return jnp.take_along_axis(blk, r8, axis=0)[0:1, :]


def to_columns(tables, pad_rows: int | None = None) -> np.ndarray:
    """Stack per-lane 1-D tables as COLUMNS: out[r, l] = tables[l][r].

    Rows pad to a multiple of 8 (or to pad_rows); missing lanes/rows are
    zero."""
    rows = max(len(t) for t in tables)
    if pad_rows is not None:
        rows = max(rows, pad_rows)
    rows = -(-rows // 8) * 8
    out = np.zeros((rows, LANE), np.int32)
    for l, t in enumerate(tables):
        out[: len(t), l] = t
    return out


def _barrel_blocks(src, n_out: int, shift8):
    """Per-lane block shift: out[b] = src[shift8 + b] for b < n_out.

    src: Python list of (8, LANE) arrays; shift8 (1, LANE) int32 in
    [0, len(src) - n_out].  Truncated barrel shifter: high-to-low tiers of
    conditional constant shifts; working set decays toward n_out.  Entries
    past a tier's source length fall back untouched — provably never read
    for lanes whose remaining shift could reach them (see module doc)."""
    work = list(src)
    max_shift = len(src) - n_out
    if max_shift <= 0:
        return work[:n_out]
    for t in reversed(range(max_shift.bit_length())):
        step = 1 << t
        take = (shift8 & step) != 0
        out_len = min(len(work), n_out + step - 1)
        new = []
        for b in range(out_len):
            hi = work[b + step] if b + step < len(work) else work[b]
            new.append(jnp.where(take, hi, work[b]))
        work = new
    return work[:n_out]


def _consume(win_lo, win_hi, k):
    """Drop k (per-lane int32, <= 32) bits from the 48-bit funnel window."""
    ku = k.astype(jnp.uint32)
    kc = ((32 - k) & 31).astype(jnp.uint32)
    lo = (win_lo >> ku) | jnp.where(k > 0, win_hi << kc, jnp.uint32(0))
    hi = win_hi >> ku
    return lo, hi


def _make_kernel(wrows: int, n_lut_chunks: int, n_tok_chunks: int,
                 use_prefix: bool, prefix_width: int, cfg: KernelCfg):
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

    def kernel(words_ref, init_ref, nsym_ref, lut_ref, tok_ref, lsb_ref,
               out_ref, st_out_ref, l2_ref, g_ref, st_ref):
        # init_ref rows: 0 = initial ANS state (int32 bit pattern, 0 for
        # prefix; host pre-reads the 32 init bits, j40.h:2446), 1 = initial
        # bit position relative to the words block, 2 = global symbol
        # offset of this call (outer segmentation)
        i = pl.program_id(0)

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
            """>=48 valid bits starting at absolute bit `bitpos` as
            (lo32, hi16) uint32; window must satisfy wordpos-gbase <= 59."""
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

        def one_symbol(state_u, bitpos, t_glob, gbase):
            active = t_glob < nsym_ref[:]
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

        @pl.when(i == 0)
        def _init():
            st_ref[0:1, :] = init_ref[0:1, :]
            st_ref[1:2, :] = init_ref[1:2, :]

        state_u = _bc_u32(st_ref[0:1, :])
        bitpos = st_ref[1:2, :]

        def l2_period(p, carry):
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

                for s in range(ROUND_SYMS):
                    local = p * ROUNDS_PER_L2 * ROUND_SYMS + r * ROUND_SYMS + s
                    t_glob = init_ref[2:3, :] + i * SEG_SYMS + local
                    state_u, bitpos, value = one_symbol(
                        state_u, bitpos, t_glob, gbase)
                    out_ref[pl.ds(local, 1), :] = value
            return state_u, bitpos

        state_u, bitpos = jax.lax.fori_loop(
            0, L2_PER_SEG, l2_period, (state_u, bitpos))

        st_ref[0:1, :] = _bc_i32(state_u)
        st_ref[1:2, :] = bitpos
        st_out_ref[0:1, :] = _bc_i32(state_u)
        st_out_ref[1:2, :] = bitpos

    return kernel


# ---------------------------------------------------------------- wrapper


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "use_prefix", "prefix_width", "wrows",
                     "cfg_key"))
def _decode_pallas(words, init, nsym, lut, tok, lsb,
                   n_steps: int, use_prefix: bool, prefix_width: int,
                   wrows: int, cfg_key=None):
    """Whole-stream-in-VMEM mode: one kernel, grid over output segments.

    `words` is (L, w16) uint16 — the raw 16-bit stream words of the ACTIVE
    lanes only; padding to 128 lanes / wrows and the transpose happen here
    on device (host->device bytes ~= the actual stream bytes)."""
    if words.dtype == jnp.uint16:
        L, w16 = words.shape
        words = jnp.pad(words.astype(jnp.int32),
                        ((0, LANE - L), (0, wrows - w16))).T
    cfg = KernelCfg(*cfg_key) if cfg_key else DEFAULT_CFG
    SEG_SYMS = cfg.seg_syms
    nseg = -(-n_steps // SEG_SYMS)
    kernel = _make_kernel(
        wrows=wrows,
        n_lut_chunks=lut.shape[0] // 8,
        n_tok_chunks=tok.shape[0] // 8,
        use_prefix=use_prefix,
        prefix_width=prefix_width,
        cfg=cfg,
    )
    const = lambda i: (0, 0)
    vals, st = pl.pallas_call(
        kernel,
        grid=(nseg,),
        in_specs=[
            pl.BlockSpec((wrows, LANE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LANE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((lut.shape[0], LANE), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tok.shape[0], LANE), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((SEG_SYMS, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LANE), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nseg * SEG_SYMS, LANE), jnp.int32),
            jax.ShapeDtypeStruct((2, LANE), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((256, LANE), jnp.int32),
            pltpu.VMEM((64, LANE), jnp.int32),
            pltpu.VMEM((8, LANE), jnp.int32),
        ],
        interpret=_interpret(),
    )(words, init, nsym, lut, tok, lsb)
    return vals, st


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "use_prefix", "prefix_width",
                     "k_syms", "wseg", "cfg_key"))
def _decode_pallas_long(words_lw, init, nsym, lut, tok, lsb,
                        n_steps: int, use_prefix: bool, prefix_width: int,
                        k_syms: int, wseg: int, cfg_key=None):
    """Segmented mode for streams too long for VMEM: an XLA scan slides a
    per-lane window (vmapped dynamic_slice over the HBM-resident streams)
    and runs the kernel per window; decoder state threads through the scan.
    One dispatch end to end."""
    cfg = KernelCfg(*cfg_key) if cfg_key else DEFAULT_CFG
    assert k_syms % cfg.seg_syms == 0
    n_outer = -(-n_steps // k_syms)
    if words_lw.dtype == jnp.uint16:
        L, w16 = words_lw.shape
        words_lw = jnp.pad(words_lw.astype(jnp.int32),
                           ((0, LANE - L), (0, wseg)))

    def seg(carry, toff):
        state, bitpos = carry                       # (1, LANE) each
        ws = bitpos >> 4                            # per-lane window start
        win = jax.vmap(
            lambda row, s: jax.lax.dynamic_slice(row, (s,), (wseg,))
        )(words_lw, ws[0])                          # (LANE, wseg)
        win = win.T                                 # (wseg, LANE)
        init_seg = jnp.concatenate(
            [state, bitpos - (ws << 4),
             jnp.broadcast_to(toff, (1, LANE))], axis=0)
        vals, st = _decode_pallas(
            win, init_seg, nsym, lut, tok, lsb,
            n_steps=k_syms, use_prefix=use_prefix,
            prefix_width=prefix_width, wrows=wseg, cfg_key=cfg.key())
        state2 = st[0:1, :]
        bitpos2 = st[1:2, :] + (ws << 4)
        return (state2, bitpos2), vals[:k_syms]

    toffs = jnp.arange(n_outer, dtype=jnp.int32) * k_syms
    (state, bitpos), vs = jax.lax.scan(
        seg, (init[0:1, :], init[1:2, :]), toffs)
    vals = vs.reshape(n_outer * k_syms, LANE)
    return vals, jnp.concatenate([state, bitpos], axis=0)


def build_lane_inputs(streams, spec: CodeSpec, segmented: bool = False,
                      k_syms: int = 0):
    """Host-side packing of per-lane streams + shared-spec LUTs.

    streams: list of (bytes, bit_offset).  Returns a dict of device inputs;
    the ANS init state (j40.h:2446) is pre-read on the host so the kernel
    needs no special-case first step."""
    from .device_entropy import pack_streams

    L = len(streams)
    assert L <= LANE
    cl = spec.clusters[0]
    if spec.use_prefix_code:
        width = max(1, cl.prefix.max_len)
        lut = pack_prefix_lut(cl.prefix, width)
        if cl.prefix.single_symbol is not None:
            alpha = cl.prefix.single_symbol + 1
        else:
            alpha = max(max(d.values())
                        for d in cl.prefix.by_len if d) + 1
    else:
        width = 0
        lut = pack_alias_lut(cl)
        alpha = 1 << spec.log_alpha_size
    tok = pack_token_lut(cl.config, alpha)

    words_lw, skips = pack_streams(streams)   # (L, W16) uint32, (L,)
    w16 = words_lw.shape[1]

    init = np.zeros((3, LANE), np.int32)
    if spec.use_prefix_code:
        init[1, :L] = skips
    else:
        cat = (words_lw[:, 0].astype(np.uint64)
               | (words_lw[:, 1].astype(np.uint64) << 16)
               | (words_lw[:, 2].astype(np.uint64) << 32))
        st0 = ((cat >> skips.astype(np.uint64)) & 0xFFFFFFFF).astype(
            np.uint32)
        init[0, :L] = st0.view(np.int32)
        init[1, :L] = skips + 32

    out = {
        "init": init,
        "lsb": np.full((1, LANE), cl.config.lsb_in_token, np.int32),
        "lut": _to_chunks(lut), "tok": _to_chunks(tok),
        "use_prefix": spec.use_prefix_code, "prefix_width": width,
    }
    out["words"] = words_lw.astype(np.uint16)  # (L, w16), device-padded
    if segmented:
        # window size: any k_syms-symbol run fits, plus barrel slack
        out["wseg"] = -(-(k_syms * 3 + 280) // 64) * 64
    else:
        # +256 rows: the L2 barrel may address 32 blocks past the last word
        out["wrows"] = -(-(w16 + 256) // 64) * 64
    return out


MAX_WROWS = 8192   # VMEM gate for whole-stream mode (words = wrows*128*4 B)
LONG_K_SYMS = 2400  # symbols per outer segment in segmented mode


def streams_fit_pallas(streams) -> bool:
    """True when whole-stream-in-VMEM mode applies (else segmented mode)."""
    longest = max(len(d) for d, _ in streams)
    return longest // 2 + 300 <= MAX_WROWS


def decode_tokens_pallas(streams, nsym, spec: CodeSpec, n_steps: int,
                         cfg: KernelCfg | None = None,
                         k_syms: int | None = None):
    """Decode `n_steps` hybrid-int values per lane for per-section streams
    sharing one code spec (spec_is_pallas_simple must hold); more than 128
    lanes run as multiple 128-lane kernel calls; streams too long for VMEM
    run in segmented mode.

    streams: list of (bytes, bit_offset) per lane; nsym: per-lane symbol
    counts.  Returns device arrays (values (L, n_steps) int32, final ANS
    state (L,) int32 bit-pattern, final bit position (L,) relative to each
    lane's packed base)."""
    if cfg is None:
        cfg = TEST_CFG if _interpret() else DEFAULT_CFG
    L = len(streams)
    nsym = np.asarray(nsym, np.int32)
    segmented = not streams_fit_pallas(streams)
    if k_syms is None:
        k_syms = LONG_K_SYMS if cfg is DEFAULT_CFG else 2 * cfg.seg_syms
    k_syms = -(-k_syms // cfg.seg_syms) * cfg.seg_syms

    v_parts, s_parts, b_parts = [], [], []
    for lo in range(0, L, LANE):
        part = streams[lo:lo + LANE]
        n = len(part)
        inp = build_lane_inputs(part, spec, segmented=segmented,
                                k_syms=k_syms)
        ns = np.zeros((1, LANE), np.int32)
        ns[0, :n] = nsym[lo:lo + n]
        common = dict(n_steps=n_steps, use_prefix=inp["use_prefix"],
                      prefix_width=inp["prefix_width"], cfg_key=cfg.key())
        if segmented:
            vals, st = _decode_pallas_long(
                jnp.asarray(inp["words"]), jnp.asarray(inp["init"]),
                jnp.asarray(ns), jnp.asarray(inp["lut"]),
                jnp.asarray(inp["tok"]), jnp.asarray(inp["lsb"]),
                k_syms=k_syms, wseg=inp["wseg"], **common)
        else:
            vals, st = _decode_pallas(
                jnp.asarray(inp["words"]), jnp.asarray(inp["init"]),
                jnp.asarray(ns), jnp.asarray(inp["lut"]),
                jnp.asarray(inp["tok"]), jnp.asarray(inp["lsb"]),
                wrows=inp["wrows"], **common)
        v_parts.append(vals[:n_steps, :n].T)
        s_parts.append(st[0, :n])
        b_parts.append(st[1, :n])
    if len(v_parts) == 1:
        return v_parts[0], s_parts[0], b_parts[0]
    return (jnp.concatenate(v_parts, axis=0),
            jnp.concatenate(s_parts), jnp.concatenate(b_parts))
