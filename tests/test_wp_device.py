"""Device wavefront for the self-correcting (weighted) predictor.

Validates `ops.device_entropy.wp_reconstruct` — the d = 2y+x anti-diagonal
scan carrying the full WP error state — bit-for-bit against the host oracle
(`modular/wp.py` WPState + `modular/decode.py` `_predict` with the
decode.py:340-347 neighbor substitution chain, i.e. reference
j40.h:3938-4125 semantics driven the way j40__modular decodes a channel).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from j40_tpu.modular.decode import _predict
from j40_tpu.modular.wp import WPParams, WPState
from j40_tpu.ops.device_entropy import wp_reconstruct


def host_wp_decode(res, pcode, params):
    """Host reference: run the channel-decode recurrence over precomputed
    (mult/offset-applied) residuals with per-pixel predictor codes."""
    H, W = res.shape
    out = np.zeros((H, W), np.int64)
    wp = WPState(params, W)
    for y in range(H):
        for x in range(W):
            w_ = out[y][x - 1] if x > 0 else (out[y - 1][x] if y > 0 else 0)
            n_ = out[y - 1][x] if y > 0 else w_
            nw = out[y - 1][x - 1] if (x > 0 and y > 0) else w_
            ne = out[y - 1][x + 1] if (x + 1 < W and y > 0) else n_
            nn = out[y - 2][x] if y > 1 else n_
            nee = out[y - 1][x + 2] if (x + 2 < W and y > 0) else ne
            ww = out[y][x - 2] if x > 1 else w_
            wp.before_predict(x, y, int(w_), int(n_), int(nw), int(ne), int(nn))
            p = _predict(int(pcode[y, x]), wp, int(w_), int(n_), int(nw),
                         int(ne), int(nn), int(nee), int(ww))
            val = int(res[y, x]) + p
            out[y, x] = val
            wp.after_predict(x, y, val)
    return out


def _compare(rng, shapes, pcode_of, params=WPParams(), hi=100, pure_wp=False):
    for (H, W) in shapes:
        L = 3
        res = rng.integers(-hi, hi + 1, size=(L, H, W)).astype(np.int32)
        pcode = pcode_of(rng, H, W)
        want = np.stack([
            host_wp_decode(res[k], pcode, params) for k in range(L)
        ])
        got = np.asarray(wp_reconstruct(
            jax.numpy.asarray(res),
            None if pure_wp else jax.numpy.asarray(np.broadcast_to(
                pcode, (L, H, W)).copy()),
            H, W, params,
        ))
        assert (got == want).all(), (H, W)


def test_wp_pure_default_params():
    rng = np.random.default_rng(7)
    _compare(rng, [(11, 13), (1, 9), (9, 1), (16, 16), (5, 37)],
             lambda rng, H, W: np.full((H, W), 6, np.int32), pure_wp=True)


def test_wp_pure_custom_params():
    rng = np.random.default_rng(8)
    params = WPParams(p1=5, p2=27, p3=(3, 0, 12, 7, 9), w=(4, 15, 9, 0))
    _compare(rng, [(12, 10), (7, 23)],
             lambda rng, H, W: np.full((H, W), 6, np.int32),
             params=params, pure_wp=True)


def test_wp_mixed_predictor_planes():
    """Multi-leaf trees: every predictor except 13 is orderable under the
    2y+x skew — random per-pixel codes over the full set."""
    rng = np.random.default_rng(9)
    codes = np.asarray([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])
    _compare(rng, [(10, 14), (3, 3), (17, 6)],
             lambda rng, H, W: codes[rng.integers(0, len(codes),
                                                  size=(H, W))].astype(np.int32))


def test_wp_large_magnitudes():
    """int16-range samples: the blend stays exact through the 12-bit-limb
    multiply (the host uses unbounded ints, the reference int64)."""
    rng = np.random.default_rng(10)
    _compare(rng, [(9, 9)], lambda rng, H, W: np.full((H, W), 6, np.int32),
             hi=8000, pure_wp=True)
