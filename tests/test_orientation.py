"""Orientation (EXIF 1-8) application at render time.  The reference parses
the field (j40.h:3152) but never applies it; we honor it like libjxl."""

import numpy as np
import pytest

from j40_tpu.decode import apply_orientation, decode_file
from j40_tpu.encode.encoder import encode_modular


def _expected(a, o):
    return {
        1: a,
        2: a[:, ::-1],
        3: a[::-1, ::-1],
        4: a[::-1, :],
        5: a.transpose(1, 0, 2),
        6: a.transpose(1, 0, 2)[:, ::-1],
        7: a.transpose(1, 0, 2)[::-1, ::-1],
        8: a.transpose(1, 0, 2)[::-1, :],
    }[o]


@pytest.mark.parametrize("o", range(1, 9))
def test_orientation_roundtrip(o):
    rng = np.random.default_rng(o)
    img = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    data = encode_modular(img, orientation=o)
    _, rgba = decode_file(data)
    np.testing.assert_array_equal(rgba[:, :, :3], _expected(img, o))


def test_orientation_involutions():
    rng = np.random.default_rng(99)
    a = rng.integers(0, 256, size=(8, 12, 4), dtype=np.uint8)
    for o in (2, 3, 4, 5, 7):  # self-inverse transforms
        np.testing.assert_array_equal(apply_orientation(apply_orientation(a, o), o), a)
    # 6 and 8 are mutual inverses
    np.testing.assert_array_equal(apply_orientation(apply_orientation(a, 6), 8), a)


def test_oriented_stream_accepted_by_reference(dj40, tmp_path):
    # dj40 parses orientation but ignores it: it must still decode our
    # oriented stream, yielding the stored (unoriented) pixels bit-exactly
    from PIL import Image as PILImage

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    data = encode_modular(img, orientation=6)
    jxl = tmp_path / "o.jxl"
    jxl.write_bytes(data)
    png = tmp_path / "o.png"
    import subprocess

    r = subprocess.run([str(dj40), str(jxl), str(png)], capture_output=True, text=True)
    assert r.returncode == 0, f"dj40 failed: {r.stderr} {r.stdout}"
    ref = np.asarray(PILImage.open(png).convert("RGB"))
    np.testing.assert_array_equal(ref, img)
