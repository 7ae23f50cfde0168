"""Device-side (JAX) entropy decode + wavefront prediction vs host oracle."""

import numpy as np
import pytest

from j40_tpu.encode.bitwriter import BitWriter
from j40_tpu.encode.entropy import EntropyEncoder
from j40_tpu.entropy.code import CodeState, read_code_spec
from j40_tpu.io.bits import BitReader
from j40_tpu.ops.device_entropy import (
    ans_luts,
    decode_tokens,
    gradient_reconstruct,
    hybrid_luts,
    pack_streams,
    prefix_lut,
    reconstruct_channel,
    spec_is_device_simple,
    unpack_signed_dev,
)


def _make_stream(values, use_prefix, seed_pad=0):
    w = BitWriter()
    if seed_pad:
        w.u(seed_pad, (1 << seed_pad) - 1)  # misalign the stream start
    enc = EntropyEncoder(1, use_prefix=use_prefix)
    enc.add_array(0, np.asarray(values, np.int64))
    enc.write(w)
    data = w.finish()
    r = BitReader(data)
    if seed_pad:
        r.u(seed_pad)
    spec = read_code_spec(r, 1)
    return data, r, spec


@pytest.mark.parametrize("use_prefix", [False, True])
def test_decode_tokens_matches_host(use_prefix):
    rng = np.random.default_rng(7)
    L, S = 5, 700
    lanes = []
    for l in range(L):
        # heavy-tailed values exercise the hybrid extra-bit path
        v = np.minimum(
            (rng.pareto(0.8, size=S) * 3).astype(np.int64), 60000
        )
        lanes.append(v)

    streams, nsym = [], []
    sym_l, fb_l, mb_l, a_l, lo_l, lsb_l = [], [], [], [], [], []
    host_vals = []
    for v in lanes:
        data, r, spec = _make_stream(v, use_prefix, seed_pad=3)
        assert spec_is_device_simple(spec)
        cl = spec.clusters[0]
        bitoff = r.bits_consumed
        streams.append((data, bitoff))
        nsym.append(len(v))
        if use_prefix:
            sym_l.append(prefix_lut(cl.prefix))
            fb_l.append(np.zeros(1, np.int32))
            alpha = 1 << 15
        else:
            fb, sym = ans_luts(cl)
            sym_l.append(sym)
            fb_l.append(fb)
            alpha = 1 << spec.log_alpha_size
        mb, A, lo = hybrid_luts(cl.config, alpha)
        mb_l.append(mb)
        a_l.append(A)
        lo_l.append(lo)
        lsb_l.append(cl.config.lsb_in_token)
        # host reference decode
        code = CodeState(spec)
        host_vals.append([code.code(r, 0) for _ in range(len(v))])
        code.finish(r)

    # pad per-lane hybrid LUTs to a common alpha
    amax = max(a.shape[0] for a in mb_l)
    pad = lambda arrs: np.stack(
        [np.pad(a, (0, amax - a.shape[0])) for a in arrs]
    )
    words, skips = pack_streams(streams)
    vals, state, bitpos = decode_tokens(
        words, skips, np.asarray(nsym, np.int32),
        np.stack(sym_l), np.stack(fb_l),
        pad(mb_l), pad(a_l), pad(lo_l),
        np.asarray(lsb_l, np.int32),
        n_steps=S, use_prefix=use_prefix,
    )
    vals = np.asarray(vals)
    for l in range(L):
        np.testing.assert_array_equal(vals[l, : nsym[l]], host_vals[l])
        np.testing.assert_array_equal(lanes[l], host_vals[l])  # sanity
    if not use_prefix:
        assert (np.asarray(state) == 0x130000).all(), "final ANS state"


def test_unpack_signed_device():
    from j40_tpu.mathutil import unpack_signed

    u = np.arange(0, 64, dtype=np.int32)
    got = np.asarray(unpack_signed_dev(u))
    ref = np.array([unpack_signed(int(x)) for x in u])
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("predictor", [0, 1, 2, 5])
def test_wavefront_reconstruct_matches_scalar(predictor):
    from j40_tpu.modular.decode import _predict

    rng = np.random.default_rng(11)
    L, H, W = 3, 13, 17
    res = rng.integers(-9, 10, size=(L, H, W)).astype(np.int32)

    # scalar oracle with the full edge-substitution chain
    ref = np.zeros_like(res)
    for l in range(L):
        v = ref[l]
        for y in range(H):
            for x in range(W):
                w_ = v[y][x - 1] if x > 0 else (v[y - 1][x] if y > 0 else 0)
                n_ = v[y - 1][x] if y > 0 else w_
                nw = v[y - 1][x - 1] if (x > 0 and y > 0) else w_
                ne = v[y - 1][x + 1] if (x + 1 < W and y > 0) else n_
                nn = v[y - 2][x] if y > 1 else n_
                nee = v[y - 1][x + 2] if (x + 2 < W and y > 0) else ne
                ww = v[y][x - 2] if x > 1 else w_
                p = _predict(predictor, None, int(w_), int(n_), int(nw),
                             int(ne), int(nn), int(nee), int(ww))
                v[y][x] = p + res[l, y, x]

    got = np.asarray(reconstruct_channel(__import__("jax").numpy.asarray(res),
                                         predictor, H, W))
    np.testing.assert_array_equal(got, ref)


def test_gradient_reconstruct_big_shape():
    # larger-than-tile shape, identity on zero residuals + known corner
    import jax.numpy as jnp

    res = np.zeros((2, 40, 72), np.int32)
    res[:, 0, 0] = 100
    out = np.asarray(gradient_reconstruct(jnp.asarray(res), 40, 72))
    np.testing.assert_array_equal(out, np.full_like(res, 100))
