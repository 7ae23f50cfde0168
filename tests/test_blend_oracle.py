"""Second oracle for alpha "over" blending (spec §5.3 kBlend,
non-premultiplied).  The reference rejects multi-frame files outright
(j40.h:8185), so dj40 cannot check compositing; the vectors here are
hand-computed from the spec formula:

    oa  = fa + ca*(1 - fa)
    out = (new*fa + old*ca*(1 - fa)) / oa        (0 when oa == 0)
    alpha_out = oa

with fa/ca the frame/canvas alphas normalized to [0, 1].  The encoder only
transports the frames losslessly; all expectations below are worked out by
hand (exact fractions in the comments)."""

import numpy as np

from j40_tpu.decode import decode_animation
from j40_tpu.encode.encoder import encode_animation


def test_blend_over_hand_vectors():
    # canvas frame (REPLACE):    color 100/100/100/50, alphas per pixel
    # second frame (BLEND over): color 200, alphas per pixel
    #
    # pixel | old C, old a | new C, new a | expected (hand-computed)
    #   0   | 100, 255     | 200, 128     | oa=1 -> a=255;
    #       |   C = 200*(128/255) + 100*(127/255) = (25600+12700)/255
    #       |     = 38300/255 = 150.196 -> 150
    #   1   | 100, 0       | 200, 128     | oa=128/255 -> a=128; C = 200
    #   2   | 100, 128     | 200, 0       | oa=128/255 -> a=128; C = 100
    #   3   | 100, 0       | 200, 0       | oa=0       -> a=0;   C = 0
    #   4   |  50, 128     | 200, 64      | oa = 64/255 + (128/255)(191/255)
    #       |   = 40768/65025 -> a = 40768/255² * 255 = 159.87 -> 160
    #       |   C = (200*64/255 + 50*128*191/255²) / oa
    #       |     = (3264000 + 1222400)/40768 = 110.047 -> 110
    old_a = [255, 0, 128, 0, 128]
    old_c = [100, 100, 100, 100, 50]
    new_a = [128, 128, 0, 0, 64]
    new_c = [200, 200, 200, 200, 200]
    want_c = [150, 200, 100, 0, 110]
    want_a = [255, 128, 128, 0, 160]

    n = len(old_a)
    f0 = np.zeros((1, n, 4), np.uint8)
    f0[0, :, 0] = f0[0, :, 1] = f0[0, :, 2] = old_c
    f0[0, :, 3] = old_a
    f1 = np.zeros((1, n, 4), np.uint8)
    f1[0, :, 0] = f1[0, :, 1] = f1[0, :, 2] = new_c
    f1[0, :, 3] = new_a

    cs = encode_animation([(f0, 1), (f1, 1, (0, 0), "blend")])
    _, frames = decode_animation(cs)
    assert len(frames) == 2
    out = frames[1][1]
    for i in range(n):
        got = out[0, i]
        assert tuple(int(v) for v in got[:3]) == (want_c[i],) * 3, (
            i, got.tolist(), want_c[i])
        assert int(got[3]) == want_a[i], (i, int(got[3]), want_a[i])


def test_blend_add_saturates_at_bpp_range():
    """ADD blending: canvas 200 + frame 100 = 300 clamps at render to 255
    (sample buffers are wider than bpp; render clamps, j40.h:7933)."""
    f0 = np.full((1, 2, 3), 200, np.uint8)
    f1 = np.zeros((1, 2, 3), np.uint8)
    f1[0, 0] = 100
    f1[0, 1] = 30
    cs = encode_animation([(f0, 1), (f1, 1, (0, 0), "add")])
    _, frames = decode_animation(cs)
    out = frames[1][1]
    assert tuple(out[0, 0, :3]) == (255, 255, 255)
    assert tuple(out[0, 1, :3]) == (230, 230, 230)
