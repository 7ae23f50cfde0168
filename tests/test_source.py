"""Pull-based input source tests (io/source.py; reference j40.h:1190-1388,
1618-1642): decode from file paths/handles through the incremental box map,
bounded header windows, and truncation/retry semantics."""

import numpy as np
import pytest

from j40_tpu.decode import Decoder
from j40_tpu.encode.encoder import encode_modular
from j40_tpu.errors import J40Error, ShortInput
from j40_tpu.io.container import wrap_container
from j40_tpu.io.source import CodestreamSource, FileSource, MemorySource


def _img(w=64, h=48, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 40, (h, w, 3), dtype=np.uint8)
    base[h // 4 : h // 2, w // 4 : w // 2] += 120
    return base


def _decode(data_or_source, **kw):
    d = Decoder(data_or_source, **kw)
    d.decode_frame()
    return d.render_rgba8()


class SpyFileSource(FileSource):
    """Tracks the largest single read and total bytes pulled."""

    def __init__(self, f):
        super().__init__(f)
        self.max_read = 0
        self.total = 0

    def read_at(self, fileoff, n):
        out = super().read_at(fileoff, n)
        self.max_read = max(self.max_read, len(out))
        self.total += len(out)
        return out


class ChunkedFileSource(FileSource):
    """Serves every read through 512-byte seeks (exercises reassembly)."""

    def read_at(self, fileoff, n):
        parts = []
        got = 0
        while got < n:
            chunk = super().read_at(fileoff + got, min(512, n - got))
            if not chunk:
                break
            parts.append(chunk)
            got += len(chunk)
        return b"".join(parts)


@pytest.mark.parametrize("jxlp_parts", [0, 3])
def test_decode_from_file_path(tmp_path, jxlp_parts):
    img = _img()
    blob = encode_modular(img)
    if jxlp_parts:
        blob = wrap_container(blob, jxlp_parts=jxlp_parts)
    p = tmp_path / "t.jxl"
    p.write_bytes(blob)
    ref = _decode(blob)
    out = _decode(str(p))
    np.testing.assert_array_equal(out, ref)


def test_decode_from_file_handle(tmp_path):
    img = _img(seed=8)
    blob = wrap_container(encode_modular(img), jxlp_parts=2)
    p = tmp_path / "t.jxl"
    p.write_bytes(blob)
    with open(p, "rb") as f:
        out = _decode(f)
    np.testing.assert_array_equal(out[:, :, :3], img)


def test_multi_jxlp_chunked_source(tmp_path):
    """A source that can only move 512 bytes per underlying read still
    decodes a 4-part jxlp container bit-exactly."""
    img = _img(128, 96, seed=9)
    blob = wrap_container(encode_modular(img), jxlp_parts=4)
    p = tmp_path / "t.jxl"
    p.write_bytes(blob)
    src = ChunkedFileSource(str(p))
    out = _decode(src)
    np.testing.assert_array_equal(out[:, :, :3], img)


def test_spans_cross_jxlp_boundaries(tmp_path):
    """Section reads that straddle jxlp box boundaries reassemble correctly
    (the codestream is split into many small boxes)."""
    img = _img(200, 160, seed=10)
    blob = wrap_container(encode_modular(img), jxlp_parts=9)
    ref = _decode(encode_modular(img))
    out = _decode(blob)
    np.testing.assert_array_equal(out, ref)


def test_file_decode_header_window_bounded(tmp_path):
    """Decoding a multi-section stream from a file never pulls the whole
    codestream into the header window: the largest single read stays well
    under the file size (sections are fetched individually on demand)."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
    blob = wrap_container(encode_modular(img), jxlp_parts=2)
    p = tmp_path / "big.jxl"
    p.write_bytes(blob)
    src = SpyFileSource(str(p))
    out = _decode(src, workers=2)
    np.testing.assert_array_equal(out[:, :, :3], img)
    assert src.max_read < len(blob) / 2, (src.max_read, len(blob))


def test_file_truncated_raises_shrt(tmp_path):
    img = _img()
    blob = wrap_container(encode_modular(img), jxlp_parts=2)
    p = tmp_path / "t.jxl"
    p.write_bytes(blob[: len(blob) // 2])
    with pytest.raises(J40Error) as ei:
        _decode(str(p))
    assert ei.value.code == "shrt"


def test_codestream_source_incremental_push():
    """Streaming MemorySource: the box walk resumes incrementally and
    available() grows monotonically as bytes arrive."""
    img = _img(96, 64, seed=11)
    blob = wrap_container(encode_modular(img), jxlp_parts=3)
    src = MemorySource(b"", final=False)
    cs = None
    avail_hist = []
    step = 97
    for off in range(0, len(blob), step):
        chunk = blob[off : off + step]
        if cs is None:
            src.extend(chunk)
            try:
                cs = CodestreamSource(src, allow_partial=True)
            except ShortInput:
                continue
        else:
            cs.extend(chunk)
        avail_hist.append(cs.available())
    assert cs is not None
    assert avail_hist == sorted(avail_hist)
    full = CodestreamSource(MemorySource(blob)).read(0, cs.available())
    assert cs.read(0, cs.available()) == full
    assert cs.complete


def test_box_rule_violations_still_checked(tmp_path):
    """jxlc after jxlp (and duplicate jxll) raise box? through the
    incremental walk, as in the whole-buffer parser."""
    img = _img(32, 32, seed=12)
    cs_all = encode_modular(img)
    from j40_tpu.io.container import FTYP_BOX, JXL_BOX, _box

    bad = JXL_BOX + FTYP_BOX
    half = len(cs_all) // 2
    bad += _box(b"jxlp", b"\x80\x00\x00\x00" + cs_all[:half])
    bad += _box(b"jxlc", cs_all[half:])
    with pytest.raises(J40Error) as ei:
        _decode(bad)
    assert ei.value.code == "box?"


def test_level_and_aux_boxes(tmp_path):
    img = _img(32, 32, seed=13)
    blob = wrap_container(
        encode_modular(img), level=10,
        extra_boxes=[(b"Exif", b"\x00" * 16)],
    )
    d = Decoder(blob)
    assert d.src.level == 10
    assert d.src.boxes and d.src.read_box(0)[0] == b"Exif"
    d.decode_frame()
    np.testing.assert_array_equal(d.render_rgba8()[:, :, :3], img)
