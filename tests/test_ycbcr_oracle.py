"""Second oracle for YCbCr rendering (spec full-range BT.601; the reference
parses do_ycbcr but refuses to render, j40.h:7867, so dj40 cannot check
this path and the golden pins are self-generated).

The vectors below are HAND-COMPUTED from the published conversion
(R = y' + 1.402 Cr, G = y' - 0.344136 Cb - 0.714136 Cr, B = y' + 1.772 Cb,
with y' = Y + 128 in 8-bit full-range terms, channels stored centered in
(Cb, Y, Cr) order).  `EncodeOptions(ycbcr_raw=True)` stores the given
planes verbatim, so the encoder contributes no color math — the decode
render path is checked against arithmetic done by hand in the comments.
"""

import numpy as np

from j40_tpu.decode import decode_file
from j40_tpu.encode.encoder import EncodeOptions, encode_modular


def _render(cb, y, cr, subsample=(0, 0, 0)):
    h, w = np.asarray(y).shape
    img = np.dstack([
        np.asarray(cb, np.int32),
        np.asarray(y, np.int32),
        np.asarray(cr, np.int32),
    ])
    cs = encode_modular(
        img, options=EncodeOptions(ycbcr=True, ycbcr_raw=True,
                                   ycbcr_subsample=subsample)
    )
    _, rgba = decode_file(cs)
    return rgba


def test_hand_vectors_fullres():
    # one pixel per vector; expected values worked by hand:
    #  (Cb, Y, Cr) = (0, 0, 0)      -> (128, 128, 128)   (y' = 128)
    #  (0, 127, 0)                  -> (255, 255, 255)
    #  (0, -128, 0)                 -> (0, 0, 0)
    #  (0, 0, 64):  R = 128+1.402*64  = 217.728 -> 218
    #               G = 128-0.714136*64 = 82.295 -> 82
    #               B = 128
    #  (-128, 0, 0): R = 128
    #               G = 128+0.344136*128 = 172.049 -> 172
    #               B = 128-1.772*128 = -98.816 -> clip 0
    #  (30, -20, -40): y' = 108
    #               R = 108-1.402*40 = 51.92 -> 52
    #               G = 108-0.344136*30+0.714136*40 = 126.241 -> 126
    #               B = 108+1.772*30 = 161.16 -> 161
    vecs = [
        ((0, 0, 0), (128, 128, 128)),
        ((0, 127, 0), (255, 255, 255)),
        ((0, -128, 0), (0, 0, 0)),
        ((0, 0, 64), (218, 82, 128)),
        ((-128, 0, 0), (128, 172, 0)),
        ((30, -20, -40), (52, 126, 161)),
    ]
    n = len(vecs)
    cb = np.array([[v[0][0] for v in vecs]])
    y = np.array([[v[0][1] for v in vecs]])
    cr = np.array([[v[0][2] for v in vecs]])
    rgba = _render(cb, y, cr)
    assert rgba.shape == (1, n, 4)
    for i, (_, want) in enumerate(vecs):
        got = tuple(int(c) for c in rgba[0, i, :3])
        assert got == want, (i, got, want)
        assert rgba[0, i, 3] == 255


def test_hand_vectors_420_subsampling():
    """420 chroma, replication upsampling: B = 128 + 1.772*Cb per 2x2 cell.
    1.772*{10,-10,20,-20} = {17.72,-17.72,35.44,-35.44}
    -> B = {146, 110, 163, 93} (round(145.72), round(110.28),
    round(163.44), round(92.56))."""
    cbq = np.array([[10, -10], [20, -20]])
    cb = np.repeat(np.repeat(cbq, 2, 0), 2, 1)  # values live at even taps
    y = np.zeros((4, 4), int)
    cr = np.zeros((4, 4), int)
    rgba = _render(cb, y, cr, subsample=(1, 0, 1))
    want_b = np.repeat(np.repeat(np.array([[146, 110], [163, 93]]), 2, 0), 2, 1)
    assert np.array_equal(rgba[:, :, 2], want_b)
    assert np.array_equal(rgba[:, :, 0], np.full((4, 4), 128))  # Cr = 0
