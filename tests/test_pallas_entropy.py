"""Pallas on-chip entropy kernel vs host oracle (interpret mode on CPU).

The kernel decodes many per-section token streams that share ONE code spec
(the format's real structure: LfGlobal/HfGlobal specs feed every section,
reference j40.h:6863, 7024) — so the tests emit one spec + N independent
token streams via EntropyEncoder's multi-stream support, then check
bit-exact values, final ANS states (0x130000, j40.h:2884-2891), and final
bit positions against the host oracle."""

import numpy as np
import pytest

from j40_tpu.encode.bitwriter import BitWriter
from j40_tpu.encode.entropy import EntropyEncoder
from j40_tpu.entropy.code import CodeState, read_code_spec
from j40_tpu.io.bits import BitReader
from j40_tpu.ops.pallas_entropy import (
    TEST_CFG,
    decode_tokens_pallas,
    spec_is_pallas_simple,
)


def make_shared_streams(lanes, use_prefix, seed_pad=3):
    """Encode each lane as an independent token stream under one spec.

    Returns (streams [(bytes, bitoff)], spec, host_vals, host_bitpos)."""
    enc = EntropyEncoder(1, use_prefix=use_prefix)
    for l, v in enumerate(lanes):
        enc.add_array(0, np.asarray(v, np.int64), stream=l)
    spec_w = BitWriter()
    if seed_pad:
        spec_w.u(seed_pad, (1 << seed_pad) - 1)
    enc.write_spec(spec_w)

    streams, host_vals, host_end = [], [], []
    spec = None
    for l, v in enumerate(lanes):
        w = BitWriter()
        if seed_pad:
            w.u(seed_pad, (1 << seed_pad) - 1)
        enc.write_spec(w)
        enc.write_tokens(w, stream=l)
        data = w.finish()
        r = BitReader(data)
        if seed_pad:
            r.u(seed_pad)
        spec = read_code_spec(r, 1)
        bitoff = r.bits_consumed
        streams.append((data, bitoff))
        code = CodeState(spec)
        host_vals.append([code.code(r, 0) for _ in range(len(v))])
        code.finish(r)
        host_end.append(r.bits_consumed)
    return streams, spec, host_vals, host_end


@pytest.mark.parametrize("use_prefix", [False, True])
@pytest.mark.parametrize("n_lanes,n_vals", [(5, 61), (1, 23)])
def test_pallas_decode_matches_host(use_prefix, n_lanes, n_vals):
    rng = np.random.default_rng(7 + n_lanes)
    lanes = [
        np.minimum((rng.pareto(0.8, size=n_vals) * 3).astype(np.int64),
                   60000)
        for _ in range(n_lanes)
    ]
    streams, spec, host_vals, _ = make_shared_streams(lanes, use_prefix)
    assert spec_is_pallas_simple(spec)
    nsym = [len(v) for v in lanes]

    vals, state, bitpos = decode_tokens_pallas(streams, nsym, spec, n_vals,
                                               cfg=TEST_CFG)
    for l in range(n_lanes):
        np.testing.assert_array_equal(vals[l, : nsym[l]], host_vals[l])
        np.testing.assert_array_equal(lanes[l], host_vals[l])  # sanity
    if not use_prefix:
        assert (state == 0x130000).all(), "final ANS state"


def test_pallas_ragged_lanes():
    """Unequal per-lane symbol counts: inactive lanes freeze, actives keep
    decoding; final states all valid."""
    rng = np.random.default_rng(5)
    counts = [7, 29, 53]
    lanes = [rng.integers(0, 500, size=c).astype(np.int64) for c in counts]
    streams, spec, host_vals, _ = make_shared_streams(lanes, False)
    vals, state, _ = decode_tokens_pallas(streams, counts, spec,
                                          max(counts), cfg=TEST_CFG)
    for l, c in enumerate(counts):
        np.testing.assert_array_equal(vals[l, :c], host_vals[l])
        assert (vals[l, c:] == 0).all()
    assert (state == 0x130000).all()


def test_pallas_matches_scan_decoder():
    """Cross-check the Pallas kernel against the lax.scan decoder on the
    same packed streams (values, final ANS state, and final bit pos)."""
    from j40_tpu.ops.device_entropy import (
        ans_luts, decode_tokens, hybrid_luts, pack_streams)

    rng = np.random.default_rng(3)
    L, S = 3, 49  # crosses segment boundaries (TEST_CFG seg_syms=24)
    lanes = [rng.integers(0, 2000, size=S).astype(np.int64)
             for _ in range(L)]
    streams, spec, _, _ = make_shared_streams(lanes, False, seed_pad=5)
    nsym = [S] * L

    cl = spec.clusters[0]
    fb, sym = ans_luts(cl)
    alpha = 1 << spec.log_alpha_size
    mb, A, lo = hybrid_luts(cl.config, alpha)
    words, skips = pack_streams(streams)
    sv, ss, sp = decode_tokens(
        words, skips, np.asarray(nsym, np.int32),
        np.stack([sym] * L), np.stack([fb] * L),
        np.stack([mb] * L), np.stack([A] * L), np.stack([lo] * L),
        np.full(L, cl.config.lsb_in_token, np.int32),
        n_steps=S, use_prefix=False)

    pv, ps, pp = decode_tokens_pallas(streams, nsym, spec, S, cfg=TEST_CFG)
    np.testing.assert_array_equal(np.asarray(sv), pv)
    np.testing.assert_array_equal(np.asarray(ss), ps)
    np.testing.assert_array_equal(np.asarray(sp), pp)


def test_pallas_segmented_long_streams(monkeypatch):
    """Segmented (windowed) mode: force it by shrinking the VMEM gate; the
    outer-scan window slide must reproduce the whole-stream results."""
    import j40_tpu.ops.pallas_entropy as pe

    rng = np.random.default_rng(9)
    L, S = 3, 101
    lanes = [rng.integers(0, 3000, size=S).astype(np.int64)
             for _ in range(L)]
    streams, spec, host_vals, _ = make_shared_streams(lanes, False)
    monkeypatch.setattr(pe, "MAX_WROWS", 1)  # everything is "too long" now
    vals, state, bitpos = decode_tokens_pallas(
        streams, [S] * L, spec, S, cfg=TEST_CFG)
    for l in range(L):
        np.testing.assert_array_equal(vals[l, :S], host_vals[l])
    assert (np.asarray(state)[:L].astype(np.uint32) == 0x130000).all()
