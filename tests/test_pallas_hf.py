"""On-chip VarDCT HF coefficient decode (ops/pallas_hf.py) vs a host
structure-walk oracle, in interpret mode on CPU.

The kernel's premise (single-cluster spec => context-free symbol sequence)
lets the test drive it with synthetic DCT8 structures emitted through the
entropy encoder's multi-stream support: per cell, per channel in Y,X,B
order, one nz token then coefficient tokens until nz nonzeros appeared
(reference structure j40.h:6888-7005, log_size = 6).

Pallas interpret mode executes at ~2 s per symbol step on this CPU, so CI
keeps one small smoke test; the thorough variants run with J40T_SLOW=1 and
on real TPU hardware via tools/bench_device_vardct.py (which also checks
full Decoder(backend="device") parity; interpret e2e would need 1024-cell
groups)."""

import os

import numpy as np
import pytest

slow = pytest.mark.skipif(
    os.environ.get("J40T_SLOW") != "1"
    and os.environ.get("J40_TESTS_TPU") != "1",
    reason="pallas interpret-mode is ~2 s/symbol-step; set J40T_SLOW=1",
)

from j40_tpu.encode.bitwriter import BitWriter
from j40_tpu.encode.entropy import EntropyEncoder
from j40_tpu.entropy.code import read_code_spec
from j40_tpu.io.bits import BitReader
from j40_tpu.mathutil import pack_signed
from j40_tpu.ops.pallas_hf import YXB2XYB, decode_hf_dct8


def _structure_tokens(rng, ncells, max_nz=12, max_pos=63):
    """Random DCT8 section structure: returns (tokens, dense oracle
    (3, ncells, 64) ordered by natural order positions 1..63)."""
    from j40_tpu.vardct.order import natural_order

    order = list(natural_order(3, 3))
    toks = []
    dense = np.zeros((3, ncells, 64), np.int32)
    for k in range(ncells):
        for cyxb in range(3):
            c = YXB2XYB[cyxb]
            nz = int(rng.integers(0, max_nz + 1))
            toks.append(nz)
            if nz == 0:
                continue
            # choose nz nonzero positions among i = 1..max_pos
            pos = sorted(rng.choice(np.arange(1, max_pos + 1), size=nz,
                                    replace=False))
            last = pos[-1]
            for i in range(1, last + 1):
                if i in pos:
                    v = int(rng.integers(1, 40)) * (1 if rng.integers(2)
                                                    else -1)
                else:
                    v = 0
                toks.append(pack_signed(v))
                dense[c, k, order[i]] += v
    return toks, dense


@slow
@pytest.mark.parametrize("use_prefix", [False, True])
def test_hf_kernel_structure_walk(use_prefix):
    from j40_tpu.vardct.order import natural_order

    rng = np.random.default_rng(21)
    ncells = [6, 3, 5]
    L = len(ncells)
    toks, denses = [], []
    enc = EntropyEncoder(1, use_prefix=use_prefix)
    for l, nc in enumerate(ncells):
        t, dense = _structure_tokens(rng, nc)
        enc.add_array(0, np.asarray(t, np.int64), stream=l)
        denses.append(dense)

    streams = []
    spec = None
    for l in range(L):
        w = BitWriter()
        enc.write_spec(w)
        enc.write_tokens(w, stream=l)
        data = w.finish()
        r = BitReader(data)
        spec = read_code_spec(r, 1)
        streams.append((data, r.bits_consumed))

    order = np.asarray(list(natural_order(3, 3)), np.int32)
    orders_yxb = np.stack([order] * 3)
    ncmax = max(ncells)
    coeffs, st = decode_hf_dct8(streams, ncells, spec, orders_yxb, ncmax)
    assert (st["done"] == 1).all()
    assert (st["err"] == 0).all()
    if not use_prefix:
        assert (st["ans_state"] == 0x130000).all()
    got = np.asarray(coeffs)
    for l, nc in enumerate(ncells):
        np.testing.assert_array_equal(got[l, :, :nc], denses[l],
                                      err_msg=f"lane {l}")


@slow
def test_hf_kernel_budget_resume(monkeypatch):
    """A too-small step budget must resume transparently (machine
    snapshot round-trip) and still produce exact planes."""
    from j40_tpu.vardct.order import natural_order

    rng = np.random.default_rng(4)
    t, dense = _structure_tokens(rng, 4, max_nz=20)
    enc = EntropyEncoder(1, use_prefix=False)
    enc.add_array(0, np.asarray(t, np.int64))
    w = BitWriter()
    enc.write(w)
    data = w.finish()
    r = BitReader(data)
    spec = read_code_spec(r, 1)

    order = np.asarray(list(natural_order(3, 3)), np.int32)
    coeffs, st = decode_hf_dct8(
        [(data, r.bits_consumed)], [4], spec, np.stack([order] * 3), 4,
        cap_steps=48)  # forces several resume rounds
    assert (st["done"] == 1).all() and (st["err"] == 0).all()
    np.testing.assert_array_equal(np.asarray(coeffs)[0], dense)


@slow
def test_hf_kernel_flags_overlong_nz():
    """nz > 63 must set the per-lane error flag (j40.h 'coef')."""
    from j40_tpu.vardct.order import natural_order

    enc = EntropyEncoder(1, use_prefix=False)
    enc.add_array(0, np.asarray([70] + [0] * 20, np.int64))
    w = BitWriter()
    enc.write(w)
    data = w.finish()
    r = BitReader(data)
    spec = read_code_spec(r, 1)
    order = np.asarray(list(natural_order(3, 3)), np.int32)
    _, st = decode_hf_dct8([(data, r.bits_consumed)], [2], spec,
                           np.stack([order] * 3), 2)
    assert st["err"][0] != 0


@slow
def test_hf_kernel_smoke():
    """Small: two lanes, one tiny valid structure and one nz>63 error
    lane, single kernel chunk."""
    from j40_tpu.vardct.order import natural_order

    rng = np.random.default_rng(2)
    t0, dense0 = _structure_tokens(rng, 1, max_nz=2, max_pos=5)
    enc = EntropyEncoder(1, use_prefix=False)
    enc.add_array(0, np.asarray(t0, np.int64), stream=0)
    enc.add_array(0, np.asarray([70, 0, 0], np.int64), stream=1)

    streams = []
    spec = None
    for l in range(2):
        w = BitWriter()
        enc.write_spec(w)
        enc.write_tokens(w, stream=l)
        data = w.finish()
        r = BitReader(data)
        spec = read_code_spec(r, 1)
        streams.append((data, r.bits_consumed))

    order = np.asarray(list(natural_order(3, 3)), np.int32)
    coeffs, st = decode_hf_dct8(streams, [1, 1], spec,
                                np.stack([order] * 3), 1, cap_steps=24)
    assert st["done"][0] == 1 and st["err"][0] == 0
    assert st["ans_state"][0] == 0x130000
    assert st["err"][1] != 0
    np.testing.assert_array_equal(np.asarray(coeffs)[0, :, :1], dense0)


def _ctx_structure(rng, ncells, gw8, nb=15, max_nz=3):
    """Random DCT8 structure + the full context chain (j40.h:6929-6992):
    returns (ctx_token_pairs, dense (3, ncells, 64), bctx3 (ncells,))."""
    from j40_tpu.vardct.tables import (TWICE_COEFF_FREQ_CTX,
                                       TWICE_COEFF_NNZ_CTX)

    bctx_yxb = [2, 0, 1]
    b3 = np.full(ncells, bctx_yxb[0] | (bctx_yxb[1] << 10)
                 | (bctx_yxb[2] << 20), np.int32)
    dense = np.zeros((3, ncells, 64))
    nonzeros = np.zeros((ncells, 3), np.int64)
    pairs = []
    for k in range(ncells):
        y8, x8 = divmod(k, gw8)
        for cyxb in range(3):
            c = YXB2XYB[cyxb]
            bctx = bctx_yxb[cyxb]
            if x8 > 0 and y8 > 0:
                nzp = (nonzeros[k - 1][c] + nonzeros[k - gw8][c] + 1) >> 1
            elif x8 > 0:
                nzp = nonzeros[k - 1][c]
            elif y8 > 0:
                nzp = nonzeros[k - gw8][c]
            else:
                nzp = 32
            nz = int(rng.integers(0, max_nz + 1))
            nzctx = bctx + (nzp if nzp < 8 else 4 + nzp // 2) * nb
            pairs.append((nzctx, nz))
            nonzeros[k][c] = nz
            cctx = 458 * bctx + 37 * nb
            prev = 1 if nz <= 4 else 0
            rem, i = nz, 1
            pos = sorted(rng.choice(np.arange(1, 12), size=nz,
                                    replace=False)) if nz else []
            while rem > 0 and i < 64:
                v = int(rng.integers(1, 5)) if i in pos else 0
                ctx = (cctx + TWICE_COEFF_NNZ_CTX[rem]
                       + TWICE_COEFF_FREQ_CTX[i] + prev)
                pairs.append((ctx, pack_signed(v)))
                dense[c, k, i] = v
                prev = 1 if v != 0 else 0
                rem -= prev
                i += 1
    return pairs, dense, b3


@slow
def test_hf_ctx_kernel_smoke():
    """Multi-cluster context-model kernel vs the host chain on a tiny
    2-cell structure (one segment in interpret mode; ~7 min of interpret
    compile, so slow-gated — the TPU-side parity check runs in bench.py's
    hf_ctx probe on every round)."""
    from j40_tpu.ops.pallas_hf import decode_hf_ctx, spec_is_pallas_ctx

    rng = np.random.default_rng(4)
    nb = 15
    ncells, gw8 = 2, 2
    pairs, dense, b3 = _ctx_structure(rng, ncells, gw8, nb=nb, max_nz=2)
    # 4-cluster map: nz contexts split in two, coeff contexts in two
    cmap = []
    for ctx in range(495 * nb):
        if ctx < 37 * nb:
            cmap.append(0 if ctx < 10 * nb else 1)
        else:
            cmap.append(2 if (ctx - 37 * nb) % 458 < 200 else 3)
    enc = EntropyEncoder(495 * nb, use_prefix=False, cluster_map=cmap)
    for ctx, tok in pairs:
        enc.add(ctx, tok, stream=0)
    w = BitWriter()
    enc.write_spec(w)
    enc.write_tokens(w, stream=0)
    data = w.finish()
    r = BitReader(data)
    spec = read_code_spec(r, 495 * nb)
    assert spec.num_clusters == 4 and spec_is_pallas_ctx(spec)

    order = np.arange(64, dtype=np.int32)
    coeffs, st = decode_hf_ctx(
        [(data, r.bits_consumed)], [ncells], spec, np.stack([order] * 3),
        [b3], [gw8], [0], nb, ncells)
    assert st["done"][0] == 1 and st["err"][0] == 0
    assert st["ans_state"][0] == 0x130000
    np.testing.assert_array_equal(np.asarray(coeffs)[0], dense)
