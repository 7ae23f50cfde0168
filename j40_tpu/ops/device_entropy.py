"""Device-side entropy decode + modular prediction (the TPU lossless path).

Decodes MANY per-group modular token streams in lockstep on the device — one
SIMD lane per stream — exploiting the format's per-section stream
independence (reference j40.h:447, 7749-7776: every TOC section is an
isolated entropy stream, the design hook for parallel decoding).  This is the
device dual of the host C++ fast path (native/core.cpp decode_channel_simple)
and covers the fjxl-style subset the encoders emit by default:

- single-leaf MA tree (fixed context), predictor 0/1/2/5, offset 0, mult 1
- one cluster, rANS (alias table) or prefix (Brotli) symbol coding
- hybrid-integer value decoding with in-stream extra bits
- no LZ77

Structure (all shapes static at trace time):

1. **Symbol scan** — a `lax.scan` over symbol steps; each step decodes one
   token for every lane: per-lane bit-buffer refill (16-bit word gathers),
   alias-table or prefix-LUT lookup (dense per-lane LUT gathers), rANS state
   update + renormalization, hybrid-int extra-bit extraction.  The tables are
   flattened to dense LUTs on host (4096-entry alias decode, 2^15-entry
   prefix decode) so each step is pure vector gathers + ALU — no
   data-dependent control flow.
2. **Wavefront reconstruction** — the gradient predictor's W/N/NW recurrence
   is clamped (data-dependent), so it cannot be a prefix sum; skewing the
   grid onto anti-diagonals makes diagonal d a pure function of diagonals
   d-1 and d-2 — a `lax.scan` of H+W-1 steps of (L, H) vector math per
   channel, no gathers in the loop (j40.h:4221-4227 + j40__gradient32).

Bit-exactness: everything is integer (uint32/int32); results match the host
oracle bit for bit (tested against dj40 end to end).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.ans import DIST_BITS
from ..entropy.code import CodeSpec

MAX_MIDBITS = 17  # refill discipline guarantees >= 17 buffered bits


# ---------------------------------------------------------------- LUT builders


def ans_luts(cluster) -> tuple[np.ndarray, np.ndarray]:
    """Dense 4096-entry decode LUTs for one ANS cluster.

    Returns (freq_base, sym): for 12-bit index `i`,
    ``state' = (freq_base[i] >> 12) * (state >> 12) + (freq_base[i] & 0xFFF)``
    and the decoded symbol is ``sym[i]`` (j40.h:2441-2461 flattened)."""
    D, aliases = cluster.D, cluster.aliases
    table_size = len(D)
    log_bucket_size = DIST_BITS - (table_size.bit_length() - 1)
    bucket_mask = (1 << log_bucket_size) - 1
    idx = np.arange(1 << DIST_BITS)
    i = idx >> log_bucket_size
    pos = idx & bucket_mask
    cutoff = np.array([b.cutoff for b in aliases], np.int64)[i]
    bsym = np.array([b.symbol for b in aliases], np.int64)[i]
    boff = np.array([b.offset for b in aliases], np.int64)[i]
    direct = pos < cutoff
    s = np.where(direct, i, bsym)
    base = np.where(direct, pos, boff + pos)
    freq = np.asarray(D, np.int64)[s]
    assert (freq > 0).all(), "zero-frequency bucket reachable"
    # freq <= 4096 needs 13 bits; base < 4096 needs 12
    freq_base = (freq << 12) | base
    assert freq_base.max() < (1 << 31)
    return freq_base.astype(np.int32), s.astype(np.int32)


def prefix_lut(code) -> np.ndarray:
    """Single-level 2^15-entry decode LUT for a prefix code.

    entry = (length << 16) | symbol, indexed by the next 15 LSB-first bits
    (the reference's two-level LUT, j40.h:2049-2242, flattened)."""
    W = 15
    lut = np.full(1 << W, -1, np.int32)
    if code.single_symbol is not None:
        lut[:] = code.single_symbol  # length 0
        return lut
    for length in range(1, code.max_len + 1):
        step = 1 << length
        for pattern, s in code.by_len[length].items():
            lut[pattern::step] = (length << 16) | s
    assert (lut >= 0).all(), "incomplete prefix code"
    return lut


def hybrid_luts(cfg, alpha_size: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-token hybrid-int LUTs (j40.h:2313-2327 flattened).

    value = (A[tok] << mb[tok]) | (mid << lsb) | lo[tok], where `mid` is
    mb[tok] raw bits from the stream."""
    split = 1 << cfg.split_exp
    bits_in_token = cfg.msb_in_token + cfg.lsb_in_token
    mb = np.zeros(alpha_size, np.int32)
    A = np.zeros(alpha_size, np.int32)
    lo = np.zeros(alpha_size, np.int32)
    for tok in range(alpha_size):
        if tok < split:
            A[tok] = tok
            continue
        midbits = cfg.split_exp - bits_in_token + ((tok - split) >> bits_in_token)
        if midbits < 0 or midbits > MAX_MIDBITS:
            mb[tok] = 0  # unreachable token (host validates via
            A[tok] = 0   # spec_is_device_simple before dispatch)
            continue
        top = 1 << cfg.msb_in_token
        lo[tok] = tok & ((1 << cfg.lsb_in_token) - 1)
        hi = (tok >> cfg.lsb_in_token) & (top - 1)
        mb[tok] = midbits
        A[tok] = (top | hi) << cfg.lsb_in_token
    return mb, A, lo


def _cluster_is_device_simple(spec: CodeSpec, cl) -> bool:
    cfg = cl.config
    if spec.use_prefix_code:
        if cl.prefix.max_len > 15:
            return False
        if cl.prefix.single_symbol is not None:
            top_token = cl.prefix.single_symbol
        else:
            top_token = max(max(d.values()) for d in cl.prefix.by_len if d)
    else:
        # only tokens with nonzero frequency are decodable
        top_token = max(t for t, f in enumerate(cl.D) if f > 0)
    split = 1 << cfg.split_exp
    if top_token < split:
        return True
    bits_in_token = cfg.msb_in_token + cfg.lsb_in_token
    worst = cfg.split_exp - bits_in_token + ((top_token - split) >> bits_in_token)
    return worst <= MAX_MIDBITS


def spec_is_device_simple(spec: CodeSpec, max_value_bits: int = 17) -> bool:
    """True when the code spec fits the device fast path: one cluster, no
    LZ77, and every reachable token's extra-bit count within the refill
    discipline (MAX_MIDBITS)."""
    if spec.lz77_enabled or spec.num_clusters != 1:
        return False
    return _cluster_is_device_simple(spec, spec.clusters[0])


def spec_is_device_multi(spec: CodeSpec) -> bool:
    """True when EVERY cluster of the spec fits the device fast path (the
    multi-context lane eligibility: no LZ77, each cluster's reachable
    extra-bit counts within the refill discipline)."""
    if spec.lz77_enabled:
        return False
    return all(_cluster_is_device_simple(spec, cl) for cl in spec.clusters)


def pack_streams(streams: list[tuple[bytes, int]]) -> tuple[np.ndarray, np.ndarray]:
    """Pack per-lane byte streams into a (L, W16) uint32 16-bit-word matrix.

    `streams` is (bytes, bit_offset) per lane; returns (words, skip_bits)
    where lane l's reader starts at word 0 with skip_bits[l] pre-consumed
    (the even-byte-aligned base keeps 16-bit word alignment)."""
    L = len(streams)
    skips = np.empty(L, np.int32)
    rows = []
    maxw = 0
    for l, (data, bitoff) in enumerate(streams):
        base = (bitoff // 8) & ~1
        skips[l] = bitoff - base * 8
        payload = data[base:]
        if len(payload) % 2:
            payload = payload + b"\0"
        w = np.frombuffer(payload, np.uint8).reshape(-1, 2)
        words = w[:, 0].astype(np.uint32) | (w[:, 1].astype(np.uint32) << 8)
        rows.append(words)
        maxw = max(maxw, len(words))
    # +16 pad: refills and the per-block hoisted window may read past the
    # stream end once a lane has finished (inactive lanes keep refilling)
    out = np.zeros((L, maxw + 16), np.uint32)
    for l, words in enumerate(rows):
        out[l, : len(words)] = words
    return out, skips


# ---------------------------------------------------------------- symbol scan


def _refill(words, buf, cnt, pos, base=None):
    """One conditional 16-bit refill (j40 bit reader order, LSB-first).

    With `base`, `words` is a per-lane window whose column 0 is stream word
    `base[l]` (the per-block hoisted gather); without, it is the full
    stream-word matrix."""
    need = cnt <= 16
    idx = pos if base is None else pos - base
    w = jnp.take_along_axis(words, idx[:, None], axis=1)[:, 0]
    buf = jnp.where(need, buf | (w << cnt.astype(jnp.uint32)), buf)
    pos = jnp.where(need, pos + 1, pos)
    cnt = jnp.where(need, cnt + 16, cnt)
    return buf, cnt, pos


def _consume(buf, cnt, nbits):
    """Drop per-lane nbits from the buffer; caller guarantees cnt >= nbits."""
    return buf >> nbits.astype(jnp.uint32), cnt - nbits


@functools.partial(jax.jit, static_argnames=("n_steps", "use_prefix", "unroll"))
def decode_tokens(
    words,        # (L, W16) uint32 16-bit stream words
    skip_bits,    # (L,) int32 initial bit skip
    nsym,         # (L,) int32 symbols per lane
    sym_lut,      # ANS: (L, 4096) int32 symbol; prefix: (L, 32768) len<<16|sym
    fb_lut,       # ANS: (L, 4096) int32 freq<<12|base; prefix: (L, 1) unused
    mb_lut,       # (L, alpha) int32 hybrid midbits per token
    a_lut,        # (L, alpha) int32
    lo_lut,       # (L, alpha) int32
    lsb,          # (L,) int32 per-lane lsb_in_token
    n_steps: int,
    use_prefix: bool,
    unroll: int = 4,
):
    """Decode `n_steps` hybrid-int values per lane in lockstep.

    Returns (values (L, n_steps) int32, final ANS state (L,) uint32, final
    bit position (L,) int32).  Lanes stop consuming once their `nsym` is
    reached; the finals feed the host-side ANS state / stream-end checks
    (j40.h:2884-2897)."""
    L = words.shape[0]
    u32 = jnp.uint32

    buf = jnp.zeros(L, u32)
    cnt = jnp.zeros(L, jnp.int32)
    pos = jnp.zeros(L, jnp.int32)
    # discard the sub-word alignment bits
    buf, cnt, pos = _refill(words, buf, cnt, pos)
    buf, cnt, pos = _refill(words, buf, cnt, pos)
    buf, cnt = _consume(buf, cnt, skip_bits)

    if use_prefix:
        state = jnp.zeros(L, u32)
    else:
        # init: state = u(16) | u(16) << 16 (j40.h:2446)
        buf, cnt, pos = _refill(words, buf, cnt, pos)
        lo16 = buf & 0xFFFF
        buf, cnt = _consume(buf, cnt, jnp.full(L, 16, jnp.int32))
        buf, cnt, pos = _refill(words, buf, cnt, pos)
        buf, cnt, pos = _refill(words, buf, cnt, pos)
        hi16 = buf & 0xFFFF
        buf, cnt = _consume(buf, cnt, jnp.full(L, 16, jnp.int32))
        state = lo16 | (hi16 << 16)

    def one_symbol(carry, t, src, base):
        buf, cnt, pos, state = carry
        active = t < nsym
        buf, cnt, pos = _refill(src, buf, cnt, pos, base)
        buf, cnt, pos = _refill(src, buf, cnt, pos, base)

        if use_prefix:
            pat = (buf & 0x7FFF).astype(jnp.int32)
            e = jnp.take_along_axis(sym_lut, pat[:, None], axis=1)[:, 0]
            length = jnp.where(active, e >> 16, 0)
            tok = e & 0xFFFF
            buf, cnt = _consume(buf, cnt, length)
        else:
            idx = (state & 0xFFF).astype(jnp.int32)
            fb = jnp.take_along_axis(fb_lut, idx[:, None], axis=1)[:, 0]
            tok = jnp.take_along_axis(sym_lut, idx[:, None], axis=1)[:, 0]
            freq = (fb >> 12).astype(u32)
            fbase = (fb & 0xFFF).astype(u32)
            nstate = freq * (state >> 12) + fbase
            renorm = active & (nstate < (1 << 16))
            w16 = buf & 0xFFFF
            nstate = jnp.where(renorm, (nstate << 16) | w16, nstate)
            buf, cnt = _consume(
                buf, cnt, jnp.where(renorm, 16, 0).astype(jnp.int32)
            )
            state = jnp.where(active, nstate, state)
        buf, cnt, pos = _refill(src, buf, cnt, pos, base)
        buf, cnt, pos = _refill(src, buf, cnt, pos, base)

        tok = jnp.where(active, tok, 0)
        mb = jnp.take_along_axis(mb_lut, tok[:, None], axis=1)[:, 0]
        A = jnp.take_along_axis(a_lut, tok[:, None], axis=1)[:, 0]
        lo = jnp.take_along_axis(lo_lut, tok[:, None], axis=1)[:, 0]
        mb = jnp.where(active, mb, 0)
        mid = (buf & ((jnp.uint32(1) << mb.astype(u32)) - 1)).astype(jnp.int32)
        buf, cnt = _consume(buf, cnt, mb)
        value = (A << mb) | (mid << lsb) | lo
        return (buf, cnt, pos, state), jnp.where(active, value, 0)

    # One symbol consumes at most ~33 bits (prefix <= 15 / ANS renorm 16,
    # plus <= MAX_MIDBITS extra bits) and the bit buffer holds < 48 bits, so
    # an `unroll`-symbol block advances `pos` by at most
    # ceil(33*unroll/16) + 3 words.  Hoisting ONE windowed gather of that
    # many contiguous words per block replaces the 6*unroll full-width
    # stream gathers whose cost scales with the stream length — those
    # dominated the scan (measured ~26 us/token-step at 64 lanes on v5e
    # before this change; see SCALING.md).
    win_w = -(-(33 * unroll) // 16) + 4
    woff = jnp.arange(win_w, dtype=jnp.int32)[None, :]

    def body(carry, ts):
        buf, cnt, pos, state = carry
        base = pos
        win = jnp.take_along_axis(words, base[:, None] + woff, axis=1)
        vals = []
        carry = (buf, cnt, pos, state)
        for j in range(unroll):
            carry, v = one_symbol(carry, ts[j], win, base)
            vals.append(v)
        return carry, jnp.stack(vals)

    n_blocks = -(-n_steps // unroll)
    ts = jnp.arange(n_blocks * unroll, dtype=jnp.int32).reshape(n_blocks, unroll)
    (buf, cnt, pos, state), vals = jax.lax.scan(body, (buf, cnt, pos, state), ts)
    values = vals.reshape(n_blocks * unroll, L)[:n_steps].T
    final_bitpos = pos * 16 - cnt
    return values, state, final_bitpos


@functools.partial(jax.jit, static_argnames=("n_steps", "use_prefix", "unroll"))
def decode_tokens_ctx(
    words,        # (L, W16) uint32 16-bit stream words
    skip_bits,    # (L,) int32 initial bit skip
    nsym,         # (L,) int32 symbols per lane
    cids,         # (L, n_steps_padded) int32 per-token cluster ids
    sym_lut,      # ANS: (L, C*4096) int32; prefix: (L, C*32768) len<<16|sym
    fb_lut,       # ANS: (L, C*4096) int32 freq<<12|base; prefix: (L, 1)
    mb_lut,       # (L, C*amax) int32 hybrid midbits per (cluster, token)
    a_lut,        # (L, C*amax) int32
    lo_lut,       # (L, C*amax) int32
    lsb,          # (L, C) int32 per-(lane, cluster) lsb_in_token
    n_steps: int,
    use_prefix: bool,
    unroll: int = 4,
):
    """Multi-context lockstep decode: like `decode_tokens`, but each token's
    symbol/hybrid LUTs are selected by a per-token cluster id (the MA-tree
    context walk, precomputed on the host for static-property trees).  The
    per-cluster LUT blocks are flattened along axis 1; a step's gather index
    is cid * block + local (the per-token analog of the per-lane base
    offsets in the multi-spec HF Pallas kernel)."""
    L = words.shape[0]
    u32 = jnp.uint32
    C = lsb.shape[1]
    amax = mb_lut.shape[1] // C

    buf = jnp.zeros(L, u32)
    cnt = jnp.zeros(L, jnp.int32)
    pos = jnp.zeros(L, jnp.int32)
    buf, cnt, pos = _refill(words, buf, cnt, pos)
    buf, cnt, pos = _refill(words, buf, cnt, pos)
    buf, cnt = _consume(buf, cnt, skip_bits)

    if use_prefix:
        state = jnp.zeros(L, u32)
    else:
        buf, cnt, pos = _refill(words, buf, cnt, pos)
        lo16 = buf & 0xFFFF
        buf, cnt = _consume(buf, cnt, jnp.full(L, 16, jnp.int32))
        buf, cnt, pos = _refill(words, buf, cnt, pos)
        buf, cnt, pos = _refill(words, buf, cnt, pos)
        hi16 = buf & 0xFFFF
        buf, cnt = _consume(buf, cnt, jnp.full(L, 16, jnp.int32))
        state = lo16 | (hi16 << 16)

    def one_symbol(carry, t, cid, src, base):
        buf, cnt, pos, state = carry
        active = t < nsym
        buf, cnt, pos = _refill(src, buf, cnt, pos, base)
        buf, cnt, pos = _refill(src, buf, cnt, pos, base)

        if use_prefix:
            pat = (buf & 0x7FFF).astype(jnp.int32) + cid * (1 << 15)
            e = jnp.take_along_axis(sym_lut, pat[:, None], axis=1)[:, 0]
            length = jnp.where(active, e >> 16, 0)
            tok = e & 0xFFFF
            buf, cnt = _consume(buf, cnt, length)
        else:
            idx = (state & 0xFFF).astype(jnp.int32) + cid * (1 << DIST_BITS)
            fb = jnp.take_along_axis(fb_lut, idx[:, None], axis=1)[:, 0]
            tok = jnp.take_along_axis(sym_lut, idx[:, None], axis=1)[:, 0]
            freq = (fb >> 12).astype(u32)
            fbase = (fb & 0xFFF).astype(u32)
            nstate = freq * (state >> 12) + fbase
            renorm = active & (nstate < (1 << 16))
            w16 = buf & 0xFFFF
            nstate = jnp.where(renorm, (nstate << 16) | w16, nstate)
            buf, cnt = _consume(
                buf, cnt, jnp.where(renorm, 16, 0).astype(jnp.int32)
            )
            state = jnp.where(active, nstate, state)
        buf, cnt, pos = _refill(src, buf, cnt, pos, base)
        buf, cnt, pos = _refill(src, buf, cnt, pos, base)

        tok = jnp.where(active, tok, 0)
        hidx = cid * amax + tok
        mb = jnp.take_along_axis(mb_lut, hidx[:, None], axis=1)[:, 0]
        A = jnp.take_along_axis(a_lut, hidx[:, None], axis=1)[:, 0]
        lo = jnp.take_along_axis(lo_lut, hidx[:, None], axis=1)[:, 0]
        lsb_c = jnp.take_along_axis(lsb, cid[:, None], axis=1)[:, 0]
        mb = jnp.where(active, mb, 0)
        mid = (buf & ((jnp.uint32(1) << mb.astype(u32)) - 1)).astype(jnp.int32)
        buf, cnt = _consume(buf, cnt, mb)
        value = (A << mb) | (mid << lsb_c) | lo
        return (buf, cnt, pos, state), jnp.where(active, value, 0)

    win_w = -(-(33 * unroll) // 16) + 4
    woff = jnp.arange(win_w, dtype=jnp.int32)[None, :]

    def body(carry, xs):
        ts, cs = xs
        buf, cnt, pos, state = carry
        base = pos
        win = jnp.take_along_axis(words, base[:, None] + woff, axis=1)
        vals = []
        carry = (buf, cnt, pos, state)
        for j in range(unroll):
            carry, v = one_symbol(carry, ts[j], cs[j], win, base)
            vals.append(v)
        return carry, jnp.stack(vals)

    n_blocks = -(-n_steps // unroll)
    ts = jnp.arange(n_blocks * unroll, dtype=jnp.int32).reshape(n_blocks, unroll)
    cs = cids[:, : n_blocks * unroll].T.reshape(n_blocks, unroll, L)
    (buf, cnt, pos, state), vals = jax.lax.scan(
        body, (buf, cnt, pos, state), (ts, cs))
    values = vals.reshape(n_blocks * unroll, L)[:n_steps].T
    final_bitpos = pos * 16 - cnt
    return values, state, final_bitpos


@jax.jit
def unpack_signed_dev(u):
    """Zig-zag decode (j40.h:610-615): 0,1,2,3 -> 0,-1,1,-2."""
    half = u >> 1
    return jnp.where((u & 1) == 1, -half - 1, half)


# ------------------------------------------------------- wavefront prediction


@functools.partial(jax.jit, static_argnames=("height", "width"))
def gradient_reconstruct(res, height: int, width: int):
    """Reconstruct (L, H, W) planes for the gradient predictor (#5) via an
    anti-diagonal wavefront scan.

    Matches modular.decode's edge-substitution chain exactly: w_ falls back
    to N at x=0 (to 0 at the origin), n_ falls back to w_, nw to w_."""
    L = res.shape[0]
    H, W = height, width
    D = H + W - 1
    yy = np.arange(H)[:, None]
    xx = np.arange(W)[None, :]
    # skew: resk[:, y, d] = res[:, y, d - y] (junk outside, masked in-scan)
    skew_src = np.clip(np.arange(D)[None, :] - yy, 0, W - 1).astype(np.int32)
    resk = jnp.take_along_axis(
        res, jnp.broadcast_to(jnp.asarray(skew_src)[None], (L, H, D)), axis=2
    )

    yrow = jnp.arange(H, dtype=jnp.int32)[None, :]  # (1, H)

    def step(carry, xs):
        col1, col2 = carry  # diagonals d-1, d-2: (L, H)
        resd, d = xs
        x = d - yrow
        valid = (x >= 0) & (x < W)
        shift_up = lambda c: jnp.concatenate(
            [jnp.zeros((L, 1), res.dtype), c[:, :-1]], axis=1
        )
        col1_up = shift_up(col1)
        col2_up = shift_up(col2)
        has_w = x > 0
        has_n = yrow > 0
        w_ = jnp.where(has_w, col1, jnp.where(has_n, col1_up, 0))
        n_ = jnp.where(has_n, col1_up, w_)
        nw = jnp.where(has_w & has_n, col2_up, w_)
        pred = jnp.clip(w_ + n_ - nw, jnp.minimum(w_, n_), jnp.maximum(w_, n_))
        newcol = jnp.where(valid, pred + resd, 0)
        return (newcol, col1), newcol

    # carry zeros derive from the input so their sharding vma matches the
    # scanned operands under shard_map (a literal jnp.zeros is "unvarying"
    # and trips the varying-manual-axes check)
    zc = res[:, :, 0] * 0
    _, cols = jax.lax.scan(
        step,
        (zc, zc),
        (resk.transpose(2, 0, 1), jnp.arange(D, dtype=jnp.int32)),
    )
    # unskew: val[:, y, x] = cols[y + x][:, y]
    valk = cols.transpose(1, 2, 0)  # (L, H, D)
    unskew = (yy + xx).astype(np.int32)  # (H, W)
    return jnp.take_along_axis(
        valk, jnp.broadcast_to(jnp.asarray(unskew)[None], (L, H, W)), axis=2
    )


@functools.partial(jax.jit, static_argnames=("height", "width"))
def mixed_reconstruct(res, pcode, height: int, width: int):
    """Reconstruct (L, H, W) planes with a PER-PIXEL predictor code
    (0=zero, 1=W, 2=N, 5=clamped gradient) via the same anti-diagonal
    wavefront as `gradient_reconstruct` — the multi-leaf MA-tree case where
    leaves carry different predictors (host analog decode.py::_predict).

    `pcode` is (L, H, W) int32.  Edge substitutions match the host chain:
    predictor 1 reads w_ (which falls back to N at x=0, 0 at the origin)
    and predictor 2 reads n_ (fallback w_)."""
    L = res.shape[0]
    H, W = height, width
    D = H + W - 1
    yy = np.arange(H)[:, None]
    xx = np.arange(W)[None, :]
    skew_src = np.clip(np.arange(D)[None, :] - yy, 0, W - 1).astype(np.int32)
    skew_idx = jnp.broadcast_to(jnp.asarray(skew_src)[None], (L, H, D))
    resk = jnp.take_along_axis(res, skew_idx, axis=2)
    pck = jnp.take_along_axis(pcode, skew_idx, axis=2)

    yrow = jnp.arange(H, dtype=jnp.int32)[None, :]  # (1, H)

    def step(carry, xs):
        col1, col2 = carry  # diagonals d-1, d-2: (L, H)
        resd, pcd, d = xs
        x = d - yrow
        valid = (x >= 0) & (x < W)
        shift_up = lambda c: jnp.concatenate(
            [jnp.zeros((L, 1), res.dtype), c[:, :-1]], axis=1
        )
        col1_up = shift_up(col1)
        col2_up = shift_up(col2)
        has_w = x > 0
        has_n = yrow > 0
        w_ = jnp.where(has_w, col1, jnp.where(has_n, col1_up, 0))
        n_ = jnp.where(has_n, col1_up, w_)
        nw = jnp.where(has_w & has_n, col2_up, w_)
        grad = jnp.clip(w_ + n_ - nw, jnp.minimum(w_, n_), jnp.maximum(w_, n_))
        pred = jnp.where(
            pcd == 0, 0,
            jnp.where(pcd == 1, w_, jnp.where(pcd == 2, n_, grad)))
        newcol = jnp.where(valid, pred + resd, 0)
        return (newcol, col1), newcol

    _, cols = jax.lax.scan(
        step,
        (jnp.zeros((L, H), res.dtype), jnp.zeros((L, H), res.dtype)),
        (resk.transpose(2, 0, 1), pck.transpose(2, 0, 1),
         jnp.arange(D, dtype=jnp.int32)),
    )
    valk = cols.transpose(1, 2, 0)  # (L, H, D)
    unskew = (yy + xx).astype(np.int32)  # (H, W)
    return jnp.take_along_axis(
        valk, jnp.broadcast_to(jnp.asarray(unskew)[None], (L, H, W)), axis=2
    )


def reconstruct_channel(res, predictor: int, height: int, width: int):
    """Per-predictor reconstruction of (L, H, W) residuals (device)."""
    if predictor == 0:
        return res
    if predictor == 5:
        return gradient_reconstruct(res, height, width)
    if predictor == 1:  # W chain; x=0 chains to the row above (edge chain)
        first = jnp.cumsum(res[:, :, 0], axis=1)
        return jnp.cumsum(res.at[:, :, 0].set(first), axis=2)
    if predictor == 2:  # N chain; y=0 chains to the left (edge chain)
        first = jnp.cumsum(res[:, 0, :], axis=1)
        return jnp.cumsum(res.at[:, 0, :].set(first), axis=1)
    raise ValueError(f"device path does not support predictor {predictor}")


# --------------------------------------------- self-correcting (WP) wavefront


def _ilog2(n):
    """floor(log2(n)) for int32 n >= 1, branchless binary search (the device
    analog of io.bits.floor_lg)."""
    v = n
    r = jnp.zeros_like(n)
    for s in (16, 8, 4, 2, 1):
        big = v >= (1 << s)
        v = jnp.where(big, v >> s, v)
        r = r + jnp.where(big, s, 0)
    return r


def _mul_shr24(a, b):
    """Exact floor((a * b) >> 24) without 64-bit ints: |a| < 2^30 signed,
    0 < b <= 2^24.  The product (< 2^51) is formed from 12-bit limbs; the
    int64 the reference uses here (j40.h:4094-4096) does not exist on the
    VPU, so this is the TPU-native spelling of the same arithmetic."""
    m = jnp.abs(a)
    mh, ml = m >> 12, m & 0xFFF
    bh, bl = b >> 12, b & 0xFFF
    low = ml * bl                              # < 2^24
    mid = mh * bl + ml * bh + (low >> 12)      # < 2^31
    q = mh * bh + (mid >> 12)                  # == (|a|*b) >> 24 exactly
    rem = ((mid & 0xFFF) != 0) | ((low & 0xFFF) != 0)
    return jnp.where(a >= 0, q, jnp.where(rem, -q - 1, -q))


def _trunc_half_sum_dev(a, b):
    """C-style (a+b)/2 truncating toward zero (decode.py::_trunc_half_sum)."""
    s = a + b
    return jnp.where(s >= 0, s >> 1, -((-s) >> 1))


@functools.partial(
    jax.jit, static_argnames=("height", "width", "params", "has_pcode")
)
def _wp_reconstruct(res, pcode, height: int, width: int, params,
                    has_pcode: bool):
    from ..modular.wp import DIV24

    L = res.shape[0]
    H, W = height, width
    D = 2 * H + W - 2  # diagonals d = 2y + x
    yy = np.arange(H)[:, None]
    xx = np.arange(W)[None, :]
    skew_src = np.clip(np.arange(D)[None, :] - 2 * yy, 0, W - 1).astype(np.int32)
    skew_idx = jnp.broadcast_to(jnp.asarray(skew_src)[None], (L, H, D))
    resk = jnp.take_along_axis(res, skew_idx, axis=2)
    if has_pcode:
        pck = jnp.take_along_axis(pcode, skew_idx, axis=2).transpose(2, 0, 1)
    else:
        pck = jnp.zeros((D, 1, 1), jnp.int32)  # unused

    yrow = jnp.arange(H, dtype=jnp.int32)[None, :]  # (1, H)
    div24 = jnp.asarray(np.asarray(DIV24, np.int32))
    wpar = jnp.asarray(np.asarray(params.w, np.int32))  # (4,)
    p1, p2 = params.p1, params.p2
    p3 = params.p3

    def up1(c):  # row y reads row y-1 (zero row in from the top)
        z = jnp.zeros(c.shape[:1] + (1,) + c.shape[2:], c.dtype)
        return jnp.concatenate([z, c[:, :-1]], axis=1)

    def step(carry, xs):
        v1, v2, v3, v4, ea1, ea2, ea3, t1, t2, t3, ovf = carry
        resd, pcd, d = xs
        x = d - 2 * yrow                      # (1, H)
        valid = (x >= 0) & (x < W)
        has_w = x > 0
        has_n = yrow > 0
        has_wn = has_w & has_n
        has_ne = has_n & (x + 1 < W)

        # pixel neighbors with the decode.py:340-347 substitution chain
        v2u, v3u = up1(v2), up1(v3)
        pw = jnp.where(has_w, v1, jnp.where(has_n, v2u, 0))
        pn = jnp.where(has_n, v2u, pw)
        pnw = jnp.where(has_wn, v3u, pw)
        pne = jnp.where(has_ne, up1(v1), pn)
        pnn = jnp.where(yrow > 1, up1(up1(v4)), pn)
        pww = jnp.where(x > 1, v2, pw)

        # per-sub-predictor error neighborhoods (wp.py:55-70)
        m_w = has_w[..., None]
        m_n = has_n[..., None]
        errw = jnp.where(m_w, ea1, 0)
        errn = jnp.where(m_n, up1(ea2), 0)
        errnw = jnp.where(has_wn[..., None], up1(ea3), errn)
        errne = jnp.where(has_ne[..., None], up1(ea1), errn)
        errww = jnp.where((x > 1)[..., None], ea2, 0)
        errw2 = jnp.where((x + 1 < W)[..., None], 0, errw)  # j40.h:4037 edge
        t2u = up1(t2)
        tew = jnp.where(has_w, t1, 0)
        ten = jnp.where(has_n, t2u, 0)
        tenw = jnp.where(has_wn, up1(t3), ten)
        tene = jnp.where(has_ne, up1(t1), ten)

        # sub-predictions (wp.py:72-89), all int32-exact for int16 samples
        pred0 = (pw + pne - pn) * 8
        pred1 = pn * 8 - (((tew + ten + tene) * p1) >> 5)
        pred2 = pw * 8 - (((tew + ten + tenw) * p2) >> 5)
        pred3 = pn * 8 - (
            (tenw * p3[0] + ten * p3[1] + tene * p3[2]
             + (pnn - pn) * 8 * p3[3] + (pnw - pw) * 8 * p3[4]) >> 5
        )
        preds = jnp.stack([pred0, pred1, pred2, pred3], axis=-1)  # (L, H, 4)

        # error-weighted blend (wp.py:91-103)
        errsum = errn + errw + errnw + errww + errne + errw2
        shift = jnp.maximum(_ilog2(errsum + 1) - 5, 0)
        wk = 4 + ((wpar * jnp.take(div24, errsum >> shift)) >> shift)
        logw = _ilog2(wk.sum(-1)) - 4
        wk = wk >> logw[..., None]
        wsum = wk.sum(-1)
        s = (preds * wk).sum(-1)
        pred4 = _mul_shr24(s + (wsum >> 1) - 1, jnp.take(div24, wsum - 1))
        agree = ((ten ^ tew) | (ten ^ tenw)) <= 0  # clamp rule (wp.py:104-107)
        lo = jnp.minimum(jnp.minimum(pw, pn), pne) * 8
        hi = jnp.maximum(jnp.maximum(pw, pn), pne) * 8
        pred4 = jnp.where(agree, jnp.clip(pred4, lo, hi), pred4)

        wppred = (pred4 + 3) >> 3  # decode.py:441
        if has_pcode:
            grad = jnp.clip(pw + pn - pnw, jnp.minimum(pw, pn),
                            jnp.maximum(pw, pn))
            sel = jnp.where(jnp.abs(pn - pnw) < jnp.abs(pw - pnw), pw, pn)
            br = [
                0, pw, pn, _trunc_half_sum_dev(pw, pn), sel, grad, wppred,
                pne, pnw, pww, _trunc_half_sum_dev(pw, pnw),
                _trunc_half_sum_dev(pn, pnw), _trunc_half_sum_dev(pn, pne),
            ]
            pred = jnp.select([pcd == k for k in range(13)], br, 0)
        else:
            pred = wppred
        val = jnp.where(valid, resd + pred, 0)

        # after_predict (wp.py:109-115); state kept zero at invalid slots
        v8 = val * 8
        ea_new = jnp.where(
            valid[..., None], (jnp.abs(preds - v8[..., None]) + 3) >> 3, 0
        )
        te_new = jnp.where(valid, pred4 - v8, 0)
        # overflow sentinel: _mul_shr24 is exact only for |a| < 2^30, and
        # `a` is bounded by the error-state magnitudes.  While every state
        # stays < 2^24 the blend input provably fits (|preds| < 2^23,
        # normalized weight sum < 2^5); a stream whose error feedback
        # grows past that (possible without any sample leaving int16
        # range) is flagged per lane so the caller re-decodes it on the
        # host path instead of silently diverging.
        risky = valid[..., None] & ((jnp.abs(ea_new) >= (1 << 24))
                                    | (jnp.abs(te_new)[..., None]
                                       >= (1 << 24)))
        ovf2 = ovf | jnp.any(risky, axis=(1, 2))
        return ((val, v1, v2, v3, ea_new, ea1, ea2, te_new, t1, t2, ovf2),
                val)

    zc = jnp.zeros((L, H), res.dtype)
    ze = jnp.zeros((L, H, 4), res.dtype)
    zovf = jnp.zeros((L,), jnp.bool_)
    fin, cols = jax.lax.scan(
        step,
        (zc, zc, zc, zc, ze, ze, ze, zc, zc, zc, zovf),
        (resk.transpose(2, 0, 1), pck, jnp.arange(D, dtype=jnp.int32)),
    )
    valk = cols.transpose(1, 2, 0)  # (L, H, D)
    unskew = (2 * yy + xx).astype(np.int32)
    vals = jnp.take_along_axis(
        valk, jnp.broadcast_to(jnp.asarray(unskew)[None], (L, H, W)), axis=2
    )
    return vals, fin[10]


def wp_reconstruct(res, pcode, height: int, width: int, params):
    """Reconstruct (L, H, W) planes whose MA tree uses the self-correcting
    (weighted) predictor, on device, bit-exactly.

    The WP recurrence reads the NE neighbor's value AND error (wp.py:58,69),
    which sits on the same y+x anti-diagonal — so the gradient wavefront's
    skew does not order it.  Skewing by d = 2y + x does: every dependency
    (W, N, NW, NE, NN, WW) lands on diagonals d-1..d-4, and diagonal d
    becomes (L, H)-vector math over a 10-array carry (4 value columns, 3
    columns of 4 sub-predictor error vectors, 3 of signed true error).  The
    diagonal count is 2H + W - 2 with min(H, W/2) lanes each — half the
    occupancy of the plain wavefront, the price of the deeper dependency.

    `pcode` is an (L, H, W) int32 per-pixel predictor plane (None = all WP):
    under this skew EVERY predictor except 13 (needs NEE, same-diagonal) is
    orderable, so multi-leaf WP trees run with per-pixel selects
    (decode.py:426-457 semantics).  `params` is the frozen WPParams from the
    modular sub-header.  Matches the host oracle (modular/wp.py) bit for bit;
    the int64 blend (j40.h:4094) is spelled as exact 12-bit-limb int32 math
    (`_mul_shr24`) because the VPU has no 64-bit multiply.
    """
    return _wp_reconstruct(res, pcode, height, width, params,
                           pcode is not None)[0]


def wp_reconstruct_ovf(res, pcode, height: int, width: int, params):
    """Like wp_reconstruct but also returns the per-lane overflow-risk
    flag (True = this lane's error state left _mul_shr24's exactness
    envelope; re-decode it on the host)."""
    return _wp_reconstruct(res, pcode, height, width, params,
                           pcode is not None)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "params", "tree_key",
                              "cidx"))
def _tree_wp_reconstruct(res, height: int, width: int, params,
                         tree_key, cidx: int, sidx):
    """WP wavefront with the MA-TREE WALK evaluated per pixel in-step.

    The device answer for NEIGHBOR-PROPERTY trees (j40.h:4177-4218,
    properties 4-15) whose code spec is single-cluster: the token
    sequence is then context-free (decoded separately at full speed) and
    only the per-pixel (predictor, offset, multiplier) selection needs
    the neighbour state — which the d = 2y + x wavefront already carries
    for the WP recurrence.  Per diagonal, every pixel walks the flattened
    tree simultaneously: property values are vector math over the
    neighbour columns (incl. property 15 = the magnitude-max true error),
    node transitions are small-table gathers.

    ``tree_key`` is a hashable tuple of tuples (prop, value, left, right,
    predictor, offset, multiplier) per node (branch prop >= 0, leaves
    carry prop = -1); ``cidx`` the slot's channel index; ``sidx`` the
    per-lane stream index (L,).  ``res`` is the RAW unpack_signed token
    plane — multiplier/offset apply per leaf in here.  Returns
    (values (L, H, W), overflow flag (L,)) like wp_reconstruct_ovf."""
    from ..modular.wp import DIV24

    prop_t, value_t, left_t, right_t, pred_t, off_t, mult_t = (
        jnp.asarray(np.asarray(col, np.int32))
        for col in zip(*tree_key))
    depth = 1
    # static walk-depth bound: longest root->leaf chain
    tk = list(tree_key)

    def _depth(i):
        if tk[i][0] < 0:
            return 0
        return 1 + max(_depth(tk[i][2]), _depth(tk[i][3]))

    depth = max(1, _depth(0))

    L = res.shape[0]
    H, W = height, width
    D = 2 * H + W - 2
    yy = np.arange(H)[:, None]
    xx = np.arange(W)[None, :]
    skew_src = np.clip(np.arange(D)[None, :] - 2 * yy, 0, W - 1).astype(np.int32)
    skew_idx = jnp.broadcast_to(jnp.asarray(skew_src)[None], (L, H, D))
    resk = jnp.take_along_axis(res, skew_idx, axis=2)

    yrow = jnp.arange(H, dtype=jnp.int32)[None, :]  # (1, H)
    div24 = jnp.asarray(np.asarray(DIV24, np.int32))
    wpar = jnp.asarray(np.asarray(params.w, np.int32))  # (4,)
    p1, p2 = params.p1, params.p2
    p3 = params.p3
    sidx_col = sidx[:, None]  # (L, 1)

    def up1(c):
        z = jnp.zeros(c.shape[:1] + (1,) + c.shape[2:], c.dtype)
        return jnp.concatenate([z, c[:, :-1]], axis=1)

    def step(carry, xs):
        v1, v2, v3, v4, ea1, ea2, ea3, t1, t2, t3, ovf = carry
        resd, d = xs
        x = d - 2 * yrow                      # (1, H)
        valid = (x >= 0) & (x < W)
        has_w = x > 0
        has_n = yrow > 0
        has_wn = has_w & has_n
        has_ne = has_n & (x + 1 < W)

        v2u, v3u = up1(v2), up1(v3)
        pw = jnp.where(has_w, v1, jnp.where(has_n, v2u, 0))
        pn = jnp.where(has_n, v2u, pw)
        pnw = jnp.where(has_wn, v3u, pw)
        pne = jnp.where(has_ne, up1(v1), pn)
        pnn = jnp.where(yrow > 1, up1(up1(v4)), pn)
        pww = jnp.where(x > 1, v2, pw)
        # NWW = (y-1, x-2): diagonal d-4, one row up
        pnww = jnp.where((x > 1) & has_n, up1(v4), pww)

        m_w = has_w[..., None]
        m_n = has_n[..., None]
        errw = jnp.where(m_w, ea1, 0)
        errn = jnp.where(m_n, up1(ea2), 0)
        errnw = jnp.where(has_wn[..., None], up1(ea3), errn)
        errne = jnp.where(has_ne[..., None], up1(ea1), errn)
        errww = jnp.where((x > 1)[..., None], ea2, 0)
        errw2 = jnp.where((x + 1 < W)[..., None], 0, errw)
        t2u = up1(t2)
        tew = jnp.where(has_w, t1, 0)
        ten = jnp.where(has_n, t2u, 0)
        tenw = jnp.where(has_wn, up1(t3), ten)
        tene = jnp.where(has_ne, up1(t1), ten)

        pred0 = (pw + pne - pn) * 8
        pred1 = pn * 8 - (((tew + ten + tene) * p1) >> 5)
        pred2 = pw * 8 - (((tew + ten + tenw) * p2) >> 5)
        pred3 = pn * 8 - (
            (tenw * p3[0] + ten * p3[1] + tene * p3[2]
             + (pnn - pn) * 8 * p3[3] + (pnw - pw) * 8 * p3[4]) >> 5
        )
        preds = jnp.stack([pred0, pred1, pred2, pred3], axis=-1)

        errsum = errn + errw + errnw + errww + errne + errw2
        shift = jnp.maximum(_ilog2(errsum + 1) - 5, 0)
        wk = 4 + ((wpar * jnp.take(div24, errsum >> shift)) >> shift)
        logw = _ilog2(wk.sum(-1)) - 4
        wk = wk >> logw[..., None]
        wsum = wk.sum(-1)
        s = (preds * wk).sum(-1)
        pred4 = _mul_shr24(s + (wsum >> 1) - 1, jnp.take(div24, wsum - 1))
        agree = ((ten ^ tew) | (ten ^ tenw)) <= 0
        lo = jnp.minimum(jnp.minimum(pw, pn), pne) * 8
        hi = jnp.maximum(jnp.maximum(pw, pn), pne) * 8
        pred4 = jnp.where(agree, jnp.clip(pred4, lo, hi), pred4)
        wppred = (pred4 + 3) >> 3

        # property 15: magnitude-max true error, W-first tie rule
        # (modular/wp.py max_error_property)
        v15 = tew
        for cand in (ten, tenw, tene):
            v15 = jnp.where(jnp.abs(v15) < jnp.abs(cand), cand, v15)

        # -- in-step MA tree walk (j40.h:4177-4218; host oracle
        # modular/decode.py:355-401).  Branch rule: val > node.value ->
        # left.
        grad = jnp.clip(pw + pn - pnw, jnp.minimum(pw, pn),
                        jnp.maximum(pw, pn))
        shape = jnp.broadcast_shapes(pw.shape, x.shape)
        bb = lambda a: jnp.broadcast_to(a, shape)
        props = [
            bb(jnp.full((1, 1), cidx)), bb(sidx_col),
            bb(yrow), bb(x),
            bb(jnp.abs(pn)), bb(jnp.abs(pw)), bb(pn), bb(pw),
            bb(jnp.where(has_w, pw - (pww + pnw - pnww), pw)),
            bb(pw + pn - pnw), bb(pw - pnw), bb(pnw - pn),
            bb(pn - pne), bb(pn - pnn), bb(pw - pww), bb(v15),
        ]
        node = jnp.zeros(shape, jnp.int32)
        for _ in range(depth):
            p = jnp.take(prop_t, node)
            v = jnp.select([p == k for k in range(16)], props, 0)
            nxt = jnp.where(v > jnp.take(value_t, node),
                            jnp.take(left_t, node), jnp.take(right_t, node))
            node = jnp.where(p < 0, node, nxt)
        pcd = jnp.take(pred_t, node)
        leaf_off = jnp.take(off_t, node)
        leaf_mult = jnp.take(mult_t, node)

        sel = jnp.where(jnp.abs(pn - pnw) < jnp.abs(pw - pnw), pw, pn)
        br = [
            0, pw, pn, _trunc_half_sum_dev(pw, pn), sel, grad, wppred,
            pne, pnw, pww, _trunc_half_sum_dev(pw, pnw),
            _trunc_half_sum_dev(pn, pnw), _trunc_half_sum_dev(pn, pne),
        ]
        pred = jnp.select([pcd == k for k in range(13)], br, 0)
        val = jnp.where(valid, resd * leaf_mult + leaf_off + pred, 0)

        v8 = val * 8
        ea_new = jnp.where(
            valid[..., None], (jnp.abs(preds - v8[..., None]) + 3) >> 3, 0
        )
        te_new = jnp.where(valid, pred4 - v8, 0)
        risky = valid[..., None] & ((jnp.abs(ea_new) >= (1 << 24))
                                    | (jnp.abs(te_new)[..., None]
                                       >= (1 << 24)))
        ovf2 = ovf | jnp.any(risky, axis=(1, 2))
        return ((val, v1, v2, v3, ea_new, ea1, ea2, te_new, t1, t2, ovf2),
                val)

    zc = jnp.zeros((L, H), res.dtype)
    ze = jnp.zeros((L, H, 4), res.dtype)
    zovf = jnp.zeros((L,), jnp.bool_)
    fin, cols = jax.lax.scan(
        step,
        (zc, zc, zc, zc, ze, ze, ze, zc, zc, zc, zovf),
        (resk.transpose(2, 0, 1), jnp.arange(D, dtype=jnp.int32)),
    )
    valk = cols.transpose(1, 2, 0)
    unskew = (2 * yy + xx).astype(np.int32)
    vals = jnp.take_along_axis(
        valk, jnp.broadcast_to(jnp.asarray(unskew)[None], (L, H, W)), axis=2
    )
    return vals, fin[10]


def tree_wp_reconstruct(res, tree_key, cidx: int, sidx, height: int,
                        width: int, params):
    """Public wrapper of _tree_wp_reconstruct (see its docstring)."""
    import jax.numpy as _jnp

    return _tree_wp_reconstruct(res, height, width, params, tree_key,
                                cidx, _jnp.asarray(sidx))
