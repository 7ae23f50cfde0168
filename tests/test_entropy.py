"""Entropy layer tests: prefix codes, hybrid ints, rANS, clustered code
(reference j40.h:2020-2917)."""

import random

import numpy as np
import pytest

from j40_tpu.encode.bitwriter import BitWriter
from j40_tpu.encode.entropy import (
    EntropyEncoder,
    huffman_lengths,
    normalize_distribution,
    prefix_codewords,
    write_prefix_code_header,
)
from j40_tpu.entropy.ans import (
    ANS_INIT_STATE,
    AnsDecoder,
    AnsEncoder,
    DIST_SUM,
    init_alias_map,
)
from j40_tpu.entropy.code import LOGCOUNT_CODE, read_code_spec, CodeState
from j40_tpu.entropy.hybrid import (
    HybridIntConfig,
    encode_hybrid_int,
    read_hybrid_int,
)
from j40_tpu.entropy.prefix import PrefixCode, read_prefix_code
from j40_tpu.io.bits import BitReader


# -- prefix codes -----------------------------------------------------------


def test_huffman_lengths_basic():
    lengths = huffman_lengths([1, 1, 2, 4], 15)
    assert sorted(lengths) == [1, 2, 3, 3]
    assert lengths[3] == 1 and lengths[2] == 2
    # kraft completeness
    assert sum(1 << (15 - l) for l in lengths if l) == 1 << 15


def test_huffman_length_limited():
    # fibonacci-ish freqs force deep trees; limit must cap them
    freqs = [1, 1, 2, 3, 5, 8, 13, 21, 34, 55]
    lengths = huffman_lengths(freqs, 5)
    assert max(lengths) <= 5
    assert sum(1 << (5 - l) for l in lengths if l) == 1 << 5


def _roundtrip_prefix(lengths, alphabet_size, symbols):
    w = BitWriter()
    write_prefix_code_header(w, lengths, alphabet_size)
    # derive codewords from the header itself (simple flat-4 codes are not
    # canonical — reference j40.h:2091 template)
    hw = BitWriter()
    write_prefix_code_header(hw, lengths, alphabet_size)
    pc = read_prefix_code(BitReader(hw.finish()), alphabet_size)
    cw = prefix_codewords(pc)
    for s in symbols:
        l, pat = cw[s]
        w.u(l, pat)
    r = BitReader(w.finish())
    code = read_prefix_code(r, alphabet_size)
    return [code.decode(r) for _ in symbols]


def test_prefix_roundtrip_simple_codes():
    # 2, 3, 4 flat, 4 tree-select
    assert _roundtrip_prefix([1, 1], 2, [0, 1, 1, 0]) == [0, 1, 1, 0]
    assert _roundtrip_prefix([1, 0, 2, 2], 4, [0, 2, 3, 0]) == [0, 2, 3, 0]
    assert _roundtrip_prefix([2, 2, 2, 2], 4, [3, 1, 0, 2]) == [3, 1, 0, 2]
    assert _roundtrip_prefix([1, 2, 3, 3], 4, [0, 3, 1, 2]) == [0, 3, 1, 2]


def test_prefix_roundtrip_complex():
    rng = random.Random(42)
    freqs = [rng.randrange(1, 100) for _ in range(40)]
    lengths = huffman_lengths(freqs, 15)
    symbols = [rng.randrange(40) for _ in range(500)]
    # drop symbols whose length is 0 (all freqs > 0 here, so none)
    assert _roundtrip_prefix(lengths, 40, symbols) == symbols


def test_prefix_roundtrip_sparse_with_zero_runs():
    # alphabet 64, only a few symbols used -> exercises 17-RLE
    lengths = [0] * 64
    lengths[5] = 1
    lengths[40] = 2
    lengths[63] = 2
    symbols = [5, 40, 63, 5, 5, 40]
    assert _roundtrip_prefix(lengths, 64, symbols) == symbols


def test_prefix_roundtrip_flat_with_16_runs():
    # 8 symbols all length 3 -> exercises 16-RLE and the l1 degenerate guard
    lengths = [3] * 8
    symbols = [0, 7, 3, 2, 2, 1, 6, 5, 4]
    assert _roundtrip_prefix(lengths, 8, symbols) == symbols


def test_prefix_single_symbol_alphabet():
    w = BitWriter()
    write_prefix_code_header(w, [1, 0, 0], 3)  # one used symbol
    r = BitReader(w.finish())
    code = read_prefix_code(r, 3)
    assert code.decode(r) == 0


def test_logcount_code_table():
    # spot-check the fixed log-count code against hand-derived codewords
    w = BitWriter()
    w.u(3, 0b000)
    r = BitReader(w.finish())
    assert LOGCOUNT_CODE.decode(r) == 10
    w = BitWriter()
    w.u(7, 0b1000001)
    r = BitReader(w.finish())
    assert LOGCOUNT_CODE.decode(r) == 13


# -- hybrid ints ------------------------------------------------------------


@pytest.mark.parametrize("cfg", [
    HybridIntConfig(4, 1, 0),
    HybridIntConfig(4, 2, 1),
    HybridIntConfig(0, 0, 0),
    HybridIntConfig(7, 3, 2),
])
def test_hybrid_int_roundtrip(cfg):
    rng = random.Random(7)
    values = [0, 1, (1 << cfg.split_exp) - 1, 1 << cfg.split_exp, 1000, 123456,
              (1 << 29)] + [rng.randrange(1 << 20) for _ in range(200)]
    w = BitWriter()
    tokens = []
    for v in values:
        token, midbits, mid = encode_hybrid_int(v, cfg)
        assert token <= cfg.max_token
        tokens.append(token)
        w.u(midbits, mid)
    r = BitReader(w.finish())
    for v, token in zip(values, tokens):
        assert read_hybrid_int(r, token, cfg) == v


# -- rANS -------------------------------------------------------------------


def test_alias_map_properties():
    rng = random.Random(3)
    for log_alpha in (5, 6, 8):
        table_size = 1 << log_alpha
        freqs = [rng.randrange(0, 50) for _ in range(table_size)]
        if sum(freqs) == 0:
            freqs[0] = 1
        D = normalize_distribution(freqs)
        aliases = init_alias_map(D, log_alpha)
        # every 12-bit index decodes to a symbol; per-symbol slot counts == D
        log_bucket = 12 - log_alpha
        counts = [0] * table_size
        for idx in range(1 << 12):
            i = idx >> log_bucket
            pos = idx & ((1 << log_bucket) - 1)
            b = aliases[i]
            sym = i if pos < b.cutoff else b.symbol
            slot = pos if pos < b.cutoff else b.offset + pos
            assert 0 <= slot < D[sym]
            counts[sym] += 1
        assert counts == D


def test_ans_roundtrip():
    rng = random.Random(9)
    log_alpha = 8
    freqs = [0] * 256
    for s in range(16):
        freqs[s] = rng.randrange(1, 100)
    D = normalize_distribution(freqs)
    enc = AnsEncoder(D, log_alpha)
    symbols = rng.choices(range(16), weights=freqs[:16], k=1000)
    words = enc.encode(symbols)
    w = BitWriter()
    wi = 0
    # emulate the decoder's on-demand reads by emitting all words up front —
    # valid because this stream interleaves nothing else
    for word in words:
        w.u(16, word)
    r = BitReader(w.finish())
    dec = AnsDecoder()
    out = [dec.code(r, 12 - log_alpha, D, enc.aliases) for _ in symbols]
    assert out == symbols
    dec.finish(r)
    assert dec.state == ANS_INIT_STATE


# -- clustered code ---------------------------------------------------------


def _roundtrip_code(num_dist, use_prefix, events, config=HybridIntConfig(4, 1, 0)):
    enc = EntropyEncoder(num_dist, use_prefix=use_prefix, config=config)
    for ctx, v in events:
        enc.add(ctx, v)
    w = BitWriter()
    enc.write(w)
    r = BitReader(w.finish())
    spec = read_code_spec(r, num_dist)
    code = CodeState(spec)
    out = [code.code(r, ctx) for ctx, _ in events]
    code.finish(r)
    r.no_more_bytes()
    return out


@pytest.mark.parametrize("use_prefix", [True, False])
def test_code_roundtrip_single_dist(use_prefix):
    rng = random.Random(11)
    events = [(0, rng.randrange(100)) for _ in range(800)]
    assert _roundtrip_code(1, use_prefix, events) == [v for _, v in events]


@pytest.mark.parametrize("use_prefix", [True, False])
def test_code_roundtrip_multi_dist(use_prefix):
    rng = random.Random(13)
    events = []
    for _ in range(600):
        ctx = rng.randrange(5)
        v = rng.randrange(10) if ctx < 3 else rng.randrange(3000)
        events.append((ctx, v))
    assert _roundtrip_code(5, use_prefix, events) == [v for _, v in events]


@pytest.mark.parametrize("use_prefix", [True, False])
def test_code_roundtrip_empty(use_prefix):
    assert _roundtrip_code(1, use_prefix, []) == []


def test_code_large_values():
    events = [(0, v) for v in [0, 1, 1 << 10, 1 << 20, (1 << 29)]]
    assert _roundtrip_code(1, True, events) == [v for _, v in events]
    assert _roundtrip_code(1, False, events) == [v for _, v in events]


def test_simple_flat4_code_vs_dj40_mapping():
    # the reference maps sorted symbol i of a flat 4-symbol simple code to
    # LSB-first pattern i (j40.h:2091), NOT the canonical reversed order;
    # regression for an ICC stream dj40 rejected with pad0
    w = BitWriter()
    write_prefix_code_header(w, [0, 0, 0, 2, 2, 0, 2, 2], 8)
    r = BitReader(w.finish())
    pc = read_prefix_code(r, 8)
    assert pc.by_len[2] == {0: 3, 1: 4, 2: 6, 3: 7}


def test_ans_rle_zero_runs_roundtrip():
    """Sparse alphabets emit logcount code-13 repeats (j40.h:2664-2667);
    the run must survive the two-phase reader."""
    import random

    from j40_tpu.encode.entropy import EntropyEncoder
    from j40_tpu.encode.bitwriter import BitWriter
    from j40_tpu.entropy.code import CodeState, read_code_spec
    from j40_tpu.io.bits import BitReader

    rng = random.Random(9)
    events = [(0, 0 if rng.random() < 0.9 else 5000) for _ in range(4000)]
    enc = EntropyEncoder(1, use_prefix=False)
    for c, v in events:
        enc.add(c, v)
    w = BitWriter()
    enc.write(w)
    r = BitReader(w.finish())
    spec = read_code_spec(r, 1)
    code = CodeState(spec)
    assert [code.code(r, c) for c, _ in events] == [v for _, v in events]
    code.finish(r)
    r.no_more_bytes()


def test_lz77_length_token_iovf_native_parity(monkeypatch):
    """An LZ77 copy-length token past the hybrid-int max_token bound must
    raise "iovf" (j40.h:2833) in BOTH the Python oracle and the native
    decoder.  A hostile encoder (monkeypatched hybrid-int) emits length
    token 68 > max_token 67 for the (4,1,0) length config — a parseable
    stream both paths must reject at the same symbol."""
    import j40_tpu.encode.entropy as enc_mod
    from j40_tpu.encode.bitwriter import BitWriter
    from j40_tpu.encode.entropy import EntropyEncoder
    from j40_tpu.entropy.code import CodeState, read_code_spec
    from j40_tpu.entropy.hybrid import HybridIntConfig
    from j40_tpu.errors import J40Error
    from j40_tpu.io.bits import BitReader

    real = enc_mod.encode_hybrid_int
    lz_cfg = HybridIntConfig(4, 1, 0)

    def hostile(value, cfg):
        if cfg == lz_cfg and value > 100:  # the copy-length emission site
            return 68, 0, 0  # token 68 > max_token(4,1,0) = 67
        return real(value, cfg)

    monkeypatch.setattr(enc_mod, "encode_hybrid_int", hostile)
    # distinct value config so only the LZ length call hits the hostile path
    enc = EntropyEncoder(1, use_prefix=True, lz77=True,
                         config=HybridIntConfig(2, 0, 0))
    for _ in range(500):
        enc.add(0, 3)
    w = BitWriter()
    enc.write(w)
    blob = w.finish()
    monkeypatch.undo()

    def parse():
        r = BitReader(blob)
        spec = read_code_spec(r, 1)
        assert spec.lz77_enabled
        return r, spec

    r, spec = parse()
    code = CodeState(spec)
    assert code.code(r, 0) == 3  # leading literal
    with pytest.raises(J40Error) as exc:
        code.code(r, 0)  # the over-bound LZ length token
    assert exc.value.code == "iovf"

    from j40_tpu.native import bindings

    if bindings.get_lib() is None:
        pytest.skip("native core unavailable")
    r2, spec2 = parse()
    ns = bindings.NativeStream(blob, r2.bits_consumed, spec2)
    with pytest.raises(Exception):
        ns.decode_symbols(np.zeros(2, dtype=np.int32))
    assert ns.error


@pytest.mark.parametrize("complex_map,nested_prefix,nested_mtf", [
    (False, True, True),
    (True, True, True),    # nested prefix-coded map + MTF
    (True, False, True),   # nested ANS map + MTF (final-state check path)
    (True, True, False),   # nested map without MTF
    (True, False, False),
])
def test_large_cluster_map_vectorized_matches_scalar(
        monkeypatch, complex_map, nested_prefix, nested_mtf):
    """The batched cluster-map readers (numpy bit extraction for simple
    maps, native symbol decode for nested maps) must agree bit-for-bit with
    the per-entry Python loop on a 500-context map (j40.h:2526-2599),
    across prefix/ANS nested streams and with/without MTF."""
    import j40_tpu.entropy.code as code_mod
    from j40_tpu.encode.bitwriter import BitWriter
    from j40_tpu.encode.entropy import EntropyEncoder

    rng = np.random.default_rng(11)
    num_dist = 500
    cmap = rng.integers(0, 4, num_dist)
    # cluster ids must cover 0..max contiguously
    cmap[:4] = [0, 1, 2, 3]
    enc = EntropyEncoder(
        num_dist, use_prefix=True, cluster_map=cmap.tolist(),
        complex_cluster_map=complex_map,
        complex_map_prefix=nested_prefix, complex_map_mtf=nested_mtf,
    )
    for ctx in range(num_dist):
        enc.add(ctx, int(rng.integers(0, 8)))
    w = BitWriter()
    enc.write(w)
    blob = w.finish()

    def read(forced_scalar):
        if forced_scalar:
            monkeypatch.setattr(code_mod, "_read_simple_entries_vec",
                                lambda *a: None)
            monkeypatch.setattr(code_mod, "_read_cluster_entries_native",
                                lambda *a: None)
        r = BitReader(blob)
        spec = code_mod.read_code_spec(r, num_dist)
        return list(spec.cluster_map), r.bits_consumed

    fast_map, fast_pos = read(False)
    monkeypatch.undo()
    scal_map, scal_pos = read(True)
    assert fast_map == cmap.tolist() == scal_map
    assert fast_pos == scal_pos
