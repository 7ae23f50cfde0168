"""Image header + container parse tests (reference: j40.h:1390-1650, 2919-3327)."""

import struct

import pytest

from j40_tpu.encode.bitwriter import BitWriter
from j40_tpu.encode.headers import write_image_metadata, write_signature
from j40_tpu.errors import J40Error
from j40_tpu.headers.image import (
    CSpace,
    TF_SRGB,
    read_image_metadata,
    read_signature,
    read_size_header,
)
from j40_tpu.io.bits import BitReader
from j40_tpu.io.container import FTYP_BOX, JXL_BOX, parse_container


def _metadata_roundtrip(**kw):
    w = BitWriter()
    write_signature(w)
    write_image_metadata(w, 256, 128, **kw)
    r = BitReader(w.finish())
    read_signature(r)
    return read_image_metadata(r)


def test_metadata_modular_rgb8():
    im = _metadata_roundtrip(bpp=8, xyb_encoded=False)
    assert (im.width, im.height) == (256, 128)
    assert im.bpp == 8 and im.exp_bits == 0
    assert not im.xyb_encoded
    assert im.modular_16bit_buffers
    assert im.num_extra_channels == 0
    assert im.cspace is CSpace.CHROMA
    assert im.gamma_or_tf == TF_SRGB
    assert im.intensity_target == 255.0


def test_metadata_all_default():
    im = _metadata_roundtrip(bpp=8, xyb_encoded=True)
    assert im.xyb_encoded and im.bpp == 8
    assert im.opsin_inv_mat[0][0] == 11.031566901960783


def test_metadata_alpha():
    im = _metadata_roundtrip(bpp=8, xyb_encoded=False, num_alpha=1)
    assert im.num_extra_channels == 1
    assert im.ec_info[0].type == 0 and im.ec_info[0].bpp == 8


def test_size_header_ratios():
    w = BitWriter()
    w.u(1, 0)
    w.u32(((1, 9), (1, 13), (1, 18), (1, 30)), 270)
    w.u(3, 5)  # 16:9
    r = BitReader(w.finish())
    assert read_size_header(r) == (480, 270)


def test_bad_signature():
    with pytest.raises(J40Error, match="!jxl"):
        read_signature(BitReader(b"\x00\x00"))


def _box(type_: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + type_ + payload


def test_container_bare():
    cs = b"\xff\x0a" + b"rest"
    c = parse_container(cs)
    assert c.is_bare and c.codestream == cs


def test_container_jxlc():
    cs = b"\xff\x0a" + b"payload"
    data = JXL_BOX + FTYP_BOX + _box(b"jxlc", cs)
    c = parse_container(data)
    assert not c.is_bare and c.codestream == cs


def test_container_jxlp_parts():
    cs = b"\xff\x0a" + bytes(range(64))
    part1 = struct.pack(">I", 0x80000000) + cs[:30]  # high bit: more follow
    part2 = struct.pack(">I", 0x00000001) + cs[30:]  # clear: final
    data = JXL_BOX + FTYP_BOX + _box(b"jxlp", part1) + _box(b"jxlp", part2)
    c = parse_container(data)
    assert c.codestream == cs


def test_container_jxlc_twice_rejected():
    cs = b"\xff\x0a"
    data = JXL_BOX + FTYP_BOX + _box(b"jxlc", cs) + _box(b"jxlc", cs)
    with pytest.raises(J40Error, match="box"):
        parse_container(data)


def test_container_skips_unknown_boxes():
    cs = b"\xff\x0adata"
    data = JXL_BOX + FTYP_BOX + _box(b"Exif", b"junk") + _box(b"jxlc", cs)
    c = parse_container(data)
    assert c.codestream == cs
    assert c.other_boxes == [(b"Exif", b"junk")]


def test_brob_wrapped_jxl_box_rejected():
    # a brob box whose inner type is jxl* or brob must be rejected ("brot",
    # j40.h:1565); other brob payloads are skipped
    import struct

    import pytest

    from j40_tpu.encode.encoder import encode_modular
    from j40_tpu.errors import J40Error
    from j40_tpu.io.container import JXL_BOX, FTYP_BOX, parse_container

    import numpy as np
    cs = encode_modular(np.zeros((8, 8, 3), np.uint8))

    def box(t, payload):
        return struct.pack(">I", 8 + len(payload)) + t + payload

    ok = JXL_BOX + FTYP_BOX + box(b"brob", b"Exif" + b"x" * 10) + box(b"jxlc", cs)
    assert parse_container(ok).codestream == cs

    for inner in (b"jxlc", b"brob", b"jxll"):
        bad = JXL_BOX + FTYP_BOX + box(b"brob", inner + b"x" * 10) + box(b"jxlc", cs)
        with pytest.raises(J40Error):
            parse_container(bad)


def test_u64_long_values_roundtrip():
    from j40_tpu.encode.bitwriter import BitWriter
    from j40_tpu.io.bits import BitReader

    values = [0, 1, 16, 17, 272, 273, 4095, 4096, 1 << 20, (1 << 40) + 12345,
              (1 << 63) + 7]
    w = BitWriter()
    for v in values:
        w.u64(v)
    r = BitReader(w.finish())
    assert [r.u64() for _ in values] == values
