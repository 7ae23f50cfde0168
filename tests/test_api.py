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
