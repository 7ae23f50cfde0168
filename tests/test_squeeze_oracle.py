"""Second oracle for the Squeeze inverse transform (spec H.6.1).

The reference decoder rejects Squeeze (j40.h:3812, 4518), so dj40 cannot
check it and the golden pins are self-generated.  This file provides an
INDEPENDENT source of truth: a from-scratch scalar transcription of the
published spec/libjxl algorithm (SmoothTendency + InvHSqueeze with C
truncating division and two's-complement `& 1`), written here without
looking at j40_tpu.modular.transforms — plus hand-computed edge vectors
where truncation direction and the clamp rules actually bite.

If both this transcription and transforms.py misread the spec the same
way, the hand vectors (worked out by hand below) still catch it.
"""

import math

import numpy as np
import pytest

from j40_tpu.modular.transforms import (
    _inv_squeeze_h,
    _inv_squeeze_v,
    _smooth_tendency,
)


# ---------------------------------------------------------------- independent
# scalar reimplementation (C semantics: trunc division, int `& 1`)


def _c_div(a: int, b: int) -> int:
    return int(math.trunc(a / b))


def smooth_tendency_ref(B: int, a: int, n: int) -> int:
    diff = 0
    if B >= a >= n:
        diff = _c_div(4 * B - 3 * n - a + 6, 12)
        if diff - (diff & 1) > 2 * (B - a):
            diff = 2 * (B - a) + 1
        if diff + (diff & 1) > 2 * (a - n):
            diff = 2 * (a - n)
    elif B <= a <= n:
        diff = _c_div(4 * B - 3 * n - a - 6, 12)
        if diff + (diff & 1) < 2 * (B - a):
            diff = 2 * (B - a) - 1
        if diff - (diff & 1) < 2 * (a - n):
            diff = 2 * (a - n)
    return diff


def inv_h_squeeze_ref(down, residu):
    """Scalar InvHSqueeze: out[2x] = avg + diff//2 (trunc), out[2x+1] =
    first - diff; odd trailing column copies the last avg."""
    h, wdown = down.shape
    wres = residu.shape[1]
    w = wdown + wres
    out = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(wres):
            avg = int(down[y, x])
            next_avg = int(down[y, x + 1]) if x + 1 < wdown else avg
            left = int(out[y, 2 * x - 1]) if x > 0 else avg
            diff = int(residu[y, x]) + smooth_tendency_ref(left, avg, next_avg)
            first = avg + _c_div(diff, 2)
            out[y, 2 * x] = first
            out[y, 2 * x + 1] = first - diff
        if w & 1:
            out[y, w - 1] = down[y, wdown - 1]
    return out


# --------------------------------------------------------- hand-worked vectors

# (B, a, n) -> expected SmoothTendency, each derived by hand:
#  (2, 1, 0):  (8-0-1+6)/12 = 13/12 -> 1; no clamp fires            -> 1
#  (3, 1, 1):  (12-3-1+6)/12 = 14/12 -> 1; 1+1=2 > 2*(a-n)=0        -> 0
#  (5, 0, 0):  (20-0-0+6)/12 = 26/12 -> 2; 2+0=2 > 0                -> 0
#  (10, 5, 0): (40-0-5+6)/12 = 41/12 -> 3; no clamp                 -> 3
#  (-2,-1, 0): (-8-0+1-6)/12 = -13/12, TRUNC -> -1 (floor were -2!);
#              -1&1=1; -1+1=0 < 2*(B-a)=-2? no; -1-1=-2 < -2? no    -> -1
#  (0, 0, 5):  (0-15-0-6)/12 = -21/12, TRUNC -> -1; -1+1=0 < 0? no;
#              -1-1=-2 < 2*(a-n)=-10? no                            -> -1
#  (0, 1, 2):  (0-6-1-6)/12 = -13/12 -> -1; -1+1=0 < -2? no;
#              -1-1=-2 < -2? no                                     -> -1
#  (1, 0, 0):  B>=a>=n: (4-0-0+6)/12 = 0; no clamp                  -> 0
#  (0, 2, 1):  neither monotone branch                              -> 0
HAND_VECTORS = [
    ((2, 1, 0), 1),
    ((3, 1, 1), 0),
    ((5, 0, 0), 0),
    ((10, 5, 0), 3),
    ((-2, -1, 0), -1),
    ((0, 0, 5), -1),
    ((0, 1, 2), -1),
    ((1, 0, 0), 0),
    ((0, 2, 1), 0),
]


@pytest.mark.parametrize("args,expected", HAND_VECTORS)
def test_smooth_tendency_hand_vectors(args, expected):
    B, a, n = args
    assert smooth_tendency_ref(B, a, n) == expected  # transcription sanity
    got = _smooth_tendency(
        np.array([B]), np.array([a]), np.array([n])
    )
    assert int(got[0]) == expected, (args, int(got[0]), expected)


def test_smooth_tendency_property():
    """Vectorized decoder impl vs the independent scalar on a dense sweep
    (covers both monotone branches, clamps, and negative truncation)."""
    vals = range(-6, 7)
    B = np.array([b for b in vals for _ in vals for _ in vals])
    a = np.array([a_ for _ in vals for a_ in vals for _ in vals])
    n = np.array([n_ for _ in vals for _ in vals for n_ in vals])
    got = _smooth_tendency(B, a, n)
    want = np.array([smooth_tendency_ref(int(x), int(y), int(z))
                     for x, y, z in zip(B, a, n)])
    assert np.array_equal(got, want)


def test_smooth_tendency_large_magnitude():
    rng = np.random.default_rng(5)
    B = rng.integers(-(1 << 20), 1 << 20, 4096)
    a = rng.integers(-(1 << 20), 1 << 20, 4096)
    n = rng.integers(-(1 << 20), 1 << 20, 4096)
    got = _smooth_tendency(B, a, n)
    want = np.array([smooth_tendency_ref(int(x), int(y), int(z))
                     for x, y, z in zip(B, a, n)])
    assert np.array_equal(got, want)


@pytest.mark.parametrize("w", [1, 2, 3, 7, 8, 17])
def test_inv_h_squeeze_vs_independent(w):
    rng = np.random.default_rng(w)
    wdown = (w + 1) // 2
    wres = w // 2
    down = rng.integers(-300, 300, (5, wdown))
    residu = rng.integers(-50, 50, (5, wres))
    got = _inv_squeeze_h(down, residu)
    want = inv_h_squeeze_ref(down, residu)
    assert np.array_equal(got.astype(np.int64), want)


def test_inv_v_squeeze_vs_independent():
    rng = np.random.default_rng(9)
    down = rng.integers(-300, 300, (5, 6))
    residu = rng.integers(-50, 50, (4, 6))
    got = _inv_squeeze_v(down, residu)
    want = inv_h_squeeze_ref(down.T, residu.T).T
    assert np.array_equal(got.astype(np.int64), want)


def test_inv_h_squeeze_hand_vector():
    """w=2 single pair, worked by hand:
    avg=5, residual=3: tendency=ST(5,5,5)=(20-15-5+6)/12=6/12=0;
    diff=3; first=5+3//2=6; out=[6, 3]."""
    out = _inv_squeeze_h(np.array([[5]]), np.array([[3]]))
    assert out.tolist() == [[6, 3]]
    # negative diff: avg=0, residual=-3 -> diff=-3, first=0+trunc(-3/2)=-1,
    # out=[-1, -1-(-3)=2]
    out = _inv_squeeze_h(np.array([[0]]), np.array([[-3]]))
    assert out.tolist() == [[-1, 2]]
