"""Multi-frame / animation decode (beyond the reference: j40 rejects any
non-final frame at j40.h:5201).  Round-trips our own animated encoder through
the frame-loop decoder and checks spec §5.3 REPLACE compositing semantics."""

import numpy as np
import pytest

from j40_tpu.decode import Decoder, decode_animation, decode_file
from j40_tpu.encode.encoder import EncodeOptions, encode_animation


def _img(seed, h=32, w=40, nc=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, nc), dtype=np.uint8)


def test_two_full_frames():
    a, b = _img(1), _img(2)
    data = encode_animation([(a, 3), (b, 5)])
    dec, frames = decode_animation(data)
    assert dec.image.anim_tps_num == 10 and dec.image.anim_tps_denom == 1
    assert [d for d, _ in frames] == [3, 5]
    np.testing.assert_array_equal(frames[0][1][:, :, :3], a)
    np.testing.assert_array_equal(frames[1][1][:, :, :3], b)


def test_cropped_frame_composites_over_previous():
    base = _img(3, 40, 48)
    patch = _img(4, 16, 8)
    data = encode_animation([(base, 1), (patch, 1, (10, 20))])
    _, frames = decode_animation(data)
    expect = base.copy()
    expect[20:36, 10:18] = patch
    np.testing.assert_array_equal(frames[1][1][:, :, :3], expect)
    # first frame untouched by the later patch
    np.testing.assert_array_equal(frames[0][1][:, :, :3], base)


def test_negative_origin_crop_clips():
    base = _img(5, 24, 24)
    patch = _img(6, 16, 16)
    data = encode_animation([(base, 1), (patch, 1, (-6, -9))])
    _, frames = decode_animation(data)
    expect = base.copy()
    expect[0:7, 0:10] = patch[9:, 6:]
    np.testing.assert_array_equal(frames[1][1][:, :, :3], expect)


def test_compositing_chain():
    # each cropped frame composites over the running canvas, not the original
    base = _img(7, 32, 32)
    p1 = _img(8, 8, 8)
    p2 = _img(9, 8, 8)
    data = encode_animation([(base, 1), (p1, 1, (0, 0)), (p2, 1, (4, 4))])
    _, frames = decode_animation(data)
    expect = base.copy()
    expect[0:8, 0:8] = p1
    np.testing.assert_array_equal(frames[1][1][:, :, :3], expect)
    expect[4:12, 4:12] = p2
    np.testing.assert_array_equal(frames[2][1][:, :, :3], expect)


def test_zero_duration_intermediate_not_displayed():
    base = _img(10, 24, 24)
    mid = _img(11, 8, 8)
    last = _img(12, 8, 8)
    data = encode_animation([(base, 2), (mid, 0, (0, 0)), (last, 4, (8, 8))])
    _, frames = decode_animation(data)
    assert len(frames) == 2  # the duration-0 frame is compositing-only
    expect = base.copy()
    expect[0:8, 0:8] = mid
    expect[8:16, 8:16] = last
    np.testing.assert_array_equal(frames[1][1][:, :, :3], expect)


def test_alpha_channel_animation():
    a = _img(13, 16, 16, nc=4)
    patch = _img(14, 8, 8, nc=4)
    data = encode_animation([(a, 1), (patch, 1, (4, 4))])
    _, frames = decode_animation(data)
    expect = a.copy()
    expect[4:12, 4:12] = patch
    np.testing.assert_array_equal(frames[1][1], expect)


def test_multigroup_animated_frames():
    a, b = _img(15, 300, 280), _img(16, 300, 280)
    opt = EncodeOptions(group_size_shift=7)
    data = encode_animation([(a, 1), (b, 1)], options=opt)
    _, frames = decode_animation(data)
    np.testing.assert_array_equal(frames[0][1][:, :, :3], a)
    np.testing.assert_array_equal(frames[1][1][:, :, :3], b)


def test_decode_file_returns_final_canvas():
    base = _img(17, 24, 24)
    patch = _img(18, 8, 8)
    data = encode_animation([(base, 1), (patch, 1, (16, 0))])
    _, rgba = decode_file(data)
    expect = base.copy()
    expect[0:8, 16:24] = patch
    np.testing.assert_array_equal(rgba[:, :, :3], expect)


def test_api_frame_iteration():
    from j40_tpu.api import RGBA, U8X4, Image

    a, b = _img(19), _img(20)
    data = encode_animation([(a, 3), (b, 5)])
    im = Image.from_memory(data)
    assert im.output_format(RGBA, U8X4)
    assert im.next_frame()
    f1 = im.current_frame()
    assert f1.duration == 3
    np.testing.assert_array_equal(f1.pixels_u8x4()[:, :, :3], a)
    assert im.next_frame()
    f2 = im.current_frame()
    assert f2.duration == 5
    np.testing.assert_array_equal(f2.pixels_u8x4()[:, :, :3], b)
    assert not im.next_frame()  # exhausted, no error
    assert im.error is None


def test_api_streaming_mid_animation():
    from j40_tpu.api import Image

    a, b = _img(21), _img(22)
    data = encode_animation([(a, 1), (b, 1)])
    im = Image.from_memory(data[: len(data) // 2])
    got_first = im.next_frame()
    if not got_first:
        assert im.error == "shrt"
    im.push(data[len(data) // 2 :])
    assert im.next_frame()
    assert im.next_frame() or got_first  # both frames eventually emitted
    np.testing.assert_array_equal(im.current_frame().pixels_u8x4()[:, :, :3], b)


def test_decoder_refuses_past_last_frame():
    from j40_tpu.errors import J40Error

    data = encode_animation([(_img(23), 1)])
    dec = Decoder(data)
    dec.decode_frame()
    assert dec.done
    with pytest.raises(J40Error):
        dec.decode_frame()


def test_alpha_blend_mode():
    # kBlend "over": second frame composites with its alpha over the first
    rng = np.random.default_rng(30)
    base = rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
    base[:, :, 3] = 255  # opaque canvas
    top = rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
    data = encode_animation([(base, 1), (top, 1, (0, 0), "blend")])
    _, frames = decode_animation(data)
    fa = top[:, :, 3].astype(np.float64) / 255.0
    expect_c = np.round(
        top[:, :, :3] * fa[..., None] + base[:, :, :3] * (1.0 - fa[..., None])
    )
    got = frames[1][1]
    assert np.abs(got[:, :, :3].astype(float) - expect_c).max() <= 1
    # alpha channel: fa + ca*(1-fa) with ca=1 -> 1 (opaque stays opaque)
    np.testing.assert_array_equal(got[:, :, 3], 255)


def test_mul_add_blend_mode():
    rng = np.random.default_rng(31)
    base = rng.integers(0, 100, size=(8, 8, 4), dtype=np.uint8)
    top = rng.integers(0, 100, size=(8, 8, 4), dtype=np.uint8)
    data = encode_animation([(base, 1), (top, 1, (0, 0), "mul_add")])
    _, frames = decode_animation(data)
    fa = top[:, :, 3].astype(np.float64) / 255.0
    expect = np.round(top[:, :, :3] * fa[..., None] + base[:, :, :3])
    got = frames[1][1][:, :, :3]
    assert np.abs(got.astype(float) - np.clip(expect, 0, 255)).max() <= 1


def test_mul_blend_mode():
    rng = np.random.default_rng(32)
    base = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    top = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    data = encode_animation([(base, 1), (top, 1, (0, 0), "mul")])
    _, frames = decode_animation(data)
    expect = np.round(base.astype(np.float64) * (top / 255.0))
    got = frames[1][1][:, :, :3]
    assert np.abs(got.astype(float) - expect).max() <= 1


def test_add_blend_mode():
    base = np.full((8, 8, 3), 50, np.uint8)
    top = np.full((8, 8, 3), 30, np.uint8)
    data = encode_animation([(base, 1), (top, 1, (0, 0), "add")])
    _, frames = decode_animation(data)
    np.testing.assert_array_equal(frames[1][1][:, :, :3], 80)


def test_vardct_animation():
    # animated VarDCT frames (full-frame REPLACE); decoder frame loop is
    # mode-agnostic
    from j40_tpu.encode.vardct_enc import encode_vardct, encode_vardct_animation

    rng = np.random.default_rng(40)
    imgs = [
        (np.cumsum(np.cumsum(rng.integers(-2, 3, (48, 56, 3)), 0), 1) % 200
         + 20).astype(np.uint8)
        for _ in range(3)
    ]
    data = encode_vardct_animation([(im, 2) for im in imgs])
    dec, frames = decode_animation(data)
    assert len(frames) == 3 and all(d == 2 for d, _ in frames)
    for im, (_, rgba) in zip(imgs, frames):
        single = decode_file(encode_vardct(im))[1]
        assert np.abs(rgba.astype(int) - single.astype(int)).max() <= 1


def test_streaming_checkpoint_resume_skips_decoded_frames():
    # after push(), already-emitted frames are not re-decoded: the decoder
    # re-enters at the saved frame boundary (buffer-checkpoint analog)
    from j40_tpu.api import Image
    import j40_tpu.decode as jd

    a, b, c = _img(60), _img(61), _img(62)
    data = encode_animation([(a, 1), (b, 1), (c, 1)])
    # cut inside frame 3
    cut = len(data) - 40
    im = Image.from_memory(data[:cut])
    assert im.next_frame() and im.next_frame()
    assert not im.next_frame() and im.error == "shrt"

    calls = []
    orig = jd.Decoder.decode_frame
    jd.Decoder.decode_frame = lambda self: calls.append(1) or orig(self)
    try:
        im.push(data[cut:])
        assert im.next_frame()
    finally:
        jd.Decoder.decode_frame = orig
    assert len(calls) == 1  # only the new frame was decoded
    np.testing.assert_array_equal(im.current_frame().pixels_u8x4()[:, :, :3], c)
