"""Public API surface tests (j40.h:8240-8477 semantics)."""

import numpy as np

from j40_tpu.api import Image, RGBA, U8X4
from j40_tpu.encode.encoder import encode_modular


def _sample(h=24, w=32):
    rng = np.random.default_rng(5)
    img = (np.cumsum(rng.integers(-3, 4, size=(h, w, 3)), axis=1) % 256).astype(
        np.uint8
    )
    return img, encode_modular(img)


def test_full_decode_via_api(tmp_path):
    img, cs = _sample()
    p = tmp_path / "t.jxl"
    p.write_bytes(cs)
    im = Image.from_file(p)
    assert im.output_format(RGBA, U8X4)
    assert im.next_frame(), im.error_string()
    fr = im.current_frame()
    assert (fr.width, fr.height) == (32, 24)
    np.testing.assert_array_equal(fr.pixels_u8x4()[:, :, :3], img)
    np.testing.assert_array_equal(fr.row_u8x4(3), fr.pixels_u8x4()[3])
    assert im.error is None and im.error_string() == "successful"


def test_streaming_retry():
    img, cs = _sample()
    im = Image.from_memory(cs[: len(cs) // 2])
    assert not im.next_frame()
    assert im.error == "shrt"  # retryable
    im.push(cs[len(cs) // 2 :])
    assert im.next_frame(), im.error_string()
    np.testing.assert_array_equal(im.current_frame().pixels_u8x4()[:, :, :3], img)


def test_byte_by_byte_streaming():
    img, cs = _sample(16, 16)
    im = Image.from_memory(b"")
    pos = 0
    while not im.next_frame():
        assert im.error == "shrt", im.error_string()
        assert pos < len(cs), "decoder claimed shrt at full input"
        step = max(1, len(cs) // 7)
        im.push(cs[pos : pos + step])
        pos += step
    np.testing.assert_array_equal(im.current_frame().pixels_u8x4()[:, :, :3], img)


def test_sections_decoded_exactly_once_while_streaming():
    # section-granular resume: a multi-group file fed in chunks must decode
    # each section exactly once (no re-parse of completed sections on push)
    from collections import Counter

    import j40_tpu.frame_state as fs_mod
    from j40_tpu.encode.vardct_enc import encode_vardct

    rng = np.random.default_rng(91)
    img = (
        np.cumsum(rng.integers(-2, 3, size=(520, 600, 3)), axis=0) % 180 + 30
    ).astype(np.uint8)
    cs = encode_vardct(img)

    calls = Counter()
    orig_lf, orig_pg = fs_mod.FrameState.lf_group, fs_mod.FrameState.pass_group

    def lf_spy(self, r, ggidx):
        calls[("lf", ggidx)] += 1
        return orig_lf(self, r, ggidx)

    def pg_spy(self, r, pass_, gidx):
        calls[("pg", pass_, gidx)] += 1
        return orig_pg(self, r, pass_, gidx)

    fs_mod.FrameState.lf_group, fs_mod.FrameState.pass_group = lf_spy, pg_spy
    try:
        im = Image.from_memory(b"")
        pos, step = 0, max(1, len(cs) // 23)
        while not im.next_frame():
            assert im.error == "shrt", im.error_string()
            assert pos < len(cs), "decoder claimed shrt at full input"
            im.push(cs[pos : pos + step])
            pos += step
    finally:
        fs_mod.FrameState.lf_group, fs_mod.FrameState.pass_group = orig_lf, orig_pg

    assert calls and max(calls.values()) == 1, f"re-decoded sections: {calls}"
    assert sum(1 for k in calls if k[0] == "pg") == 9  # 3x3 groups of 256px
    from j40_tpu.decode import decode_file

    _, ref = decode_file(cs)
    # the API resolves backend 'auto' (device path when the native library
    # is disabled), decode_file defaults to numpy: allow the one-gray-level
    # float-reassociation skew between reconstruction backends
    got = im.current_frame().pixels_u8x4()
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_streaming_multiframe_animation_chunks():
    # frames spanning chunk boundaries: completed frames stay emitted-once,
    # the in-flight frame resumes, blending chain preserved
    from j40_tpu.decode import decode_animation
    from j40_tpu.encode.encoder import encode_animation

    rng = np.random.default_rng(92)
    frames = [
        ((rng.integers(0, 255, (40, 48, 3))).astype(np.uint8), 1) for _ in range(3)
    ]
    cs = encode_animation(frames)
    _, ref_frames = decode_animation(cs)

    im = Image.from_memory(b"")
    got = []
    pos, step = 0, max(1, len(cs) // 11)
    while True:
        if im.next_frame():
            got.append(im.current_frame().pixels_u8x4().copy())
            continue
        if im.error is None:
            break  # done: all frames emitted
        assert im.error == "shrt", im.error_string()
        if pos >= len(cs):
            raise AssertionError("shrt at full input")
        im.push(cs[pos : pos + step])
        pos += step
    assert len(got) == len(ref_frames)
    for (dur, ref), ours in zip(ref_frames, got):
        np.testing.assert_array_equal(ours, ref)


def test_bad_signature_not_retryable():
    im = Image.from_memory(b"\x00\x01\x02\x03" * 10)
    assert not im.next_frame()
    assert im.error == "!jxl"
    im.push(b"more")
    assert not im.next_frame()  # sticky non-retryable error


def test_error_pixels_on_misuse():
    im = Image.from_memory(b"")
    fr = im.current_frame()  # no next_frame() call: placeholder
    assert (fr.height, fr.width) == (7, 21)
    assert (fr.pixels_u8x4()[:, :, 0] == 0x80).all()


def test_output_format_rejects_others():
    im = Image.from_memory(b"")
    assert not im.output_format(3, U8X4)
    assert im.error == "fmt?"


def test_open_missing_file():
    im = Image.from_file("/nonexistent/file.jxl")
    assert not im.next_frame()
    assert im.error == "open"


def test_u16x4_output_format():
    # 16-bit output (J40_U16X4 is reserved-but-rejected in the reference)
    import numpy as np

    from j40_tpu.api import RGBA, U16X4, Image
    from j40_tpu.encode.encoder import encode_modular

    rng = np.random.default_rng(80)
    img = rng.integers(0, 1 << 12, (12, 16, 3)).astype(np.int32)
    im = Image.from_memory(encode_modular(img, bpp=12))
    assert im.output_format(RGBA, U16X4)
    assert im.next_frame()
    px = im.current_frame().pixels_u16x4()
    assert px.dtype == np.uint16
    expect = ((img.astype(np.int64) * 65535 + (1 << 11)) // 4095).astype(np.uint16)
    np.testing.assert_array_equal(px[:, :, :3], expect)


def test_icc_profile_exposed():
    # the reference entropy-decodes the ICC payload then discards it
    # (j40.h:3390-3392); we retain it and expose it on the handle
    import numpy as np

    from j40_tpu.api import RGBA, U8X4, Image
    from j40_tpu.encode.encoder import encode_modular

    rng = np.random.default_rng(81)
    img = rng.integers(0, 255, (16, 20, 3)).astype(np.uint8)
    icc = b"\x00\x00\x02\x00fake-icc-payload" + bytes(range(128))
    im = Image.from_memory(encode_modular(img, icc=icc))
    assert im.output_format(RGBA, U8X4)
    assert im.icc_profile is None  # not parsed before next_frame
    assert im.next_frame()
    assert im.icc_profile == icc


def test_row_u16x4():
    import numpy as np

    from j40_tpu.api import RGBA, U16X4, Image
    from j40_tpu.encode.encoder import encode_modular

    rng = np.random.default_rng(82)
    img = rng.integers(0, 1 << 10, (8, 10, 3)).astype(np.int32)
    im = Image.from_memory(encode_modular(img, bpp=10))
    assert im.output_format(RGBA, U16X4)
    assert im.next_frame()
    fr = im.current_frame()
    np.testing.assert_array_equal(fr.row_u16x4(3), fr.pixels_u16x4()[3])


def test_render_rgba8_device():
    """Device-resident RGBA (serving fast path) matches the host render,
    and the fallback (modular / no device planes) round-trips."""
    import numpy as np

    from j40_tpu.decode import Decoder
    from j40_tpu.encode.vardct_enc import encode_vardct

    rng = np.random.default_rng(7)
    img = (np.cumsum(rng.integers(-2, 3, size=(72, 96, 3)), axis=1)
           % 200 + 20).astype(np.uint8)
    d = Decoder(encode_vardct(img), backend="jax", keep_device_output=True)
    d.decode_frame()
    dev = d.render_rgba8_device()
    assert np.array_equal(np.asarray(dev), d.render_rgba8())


def test_streaming_input_trimming():
    """Committed input is released as sections complete: retained buffer
    stays O(pending section), not O(stream) (j40.h:1706-1715 analog)."""
    rng = np.random.default_rng(17)
    img = (
        np.cumsum(np.cumsum(rng.integers(-2, 3, size=(300, 900, 3)), 0), 1)
        % 256
    ).astype(np.uint8)
    from j40_tpu.encode.encoder import encode_modular

    cs = encode_modular(img)  # 1x4 groups of 256px

    im = Image.from_memory(b"")
    step = max(1, len(cs) // 60)
    pos = 0
    peak = 0
    while not im.next_frame():
        assert im.error == "shrt", im.error_string()
        assert pos < len(cs)
        im.push(cs[pos : pos + step])
        pos += step
        if im._dec is not None:
            peak = max(peak, im._dec.src.retained_bytes)
    got = im.current_frame().pixels_u8x4()
    assert np.array_equal(got[:, :, :3], img)
    # each of the 4 groups is ~len/4; retained must stay well under the
    # whole stream (pending-section suffix + one push chunk)
    assert peak < 0.55 * len(cs), (peak, len(cs))
