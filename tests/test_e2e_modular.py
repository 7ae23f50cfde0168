"""End-to-end differential tests: our encoder's files decoded by BOTH our
decoder and the reference dj40 binary must agree bit-exactly
(BASELINE config 1 gate; see SURVEY.md §4)."""

import subprocess

import numpy as np
import pytest
from PIL import Image

from j40_tpu.decode import decode_file
from j40_tpu.encode.encoder import EncodeOptions, encode_modular


def _dj40_decode(dj40, jxl_bytes, tmp_path):
    jxl = tmp_path / "t.jxl"
    png = tmp_path / "t.png"
    jxl.write_bytes(jxl_bytes)
    r = subprocess.run(
        [str(dj40), str(jxl), str(png)], capture_output=True, text=True
    )
    assert r.returncode == 0, f"dj40 failed: {r.stderr} {r.stdout}"
    return np.asarray(Image.open(png).convert("RGBA"))


def _roundtrip(dj40, tmp_path, img, opt=None):
    cs = encode_modular(img, options=opt)
    ref = _dj40_decode(dj40, cs, tmp_path)
    _, rgba = decode_file(cs)
    np.testing.assert_array_equal(rgba, ref, err_msg="mismatch vs dj40 oracle")
    np.testing.assert_array_equal(rgba[:, :, :3], img, err_msg="not lossless")
    assert (rgba[:, :, 3] == 255).all()


@pytest.fixture(scope="module")
def smooth_img():
    rng = np.random.default_rng(42)
    return (np.cumsum(rng.integers(-3, 4, size=(48, 56, 3)), axis=1) % 256).astype(
        np.uint8
    )


@pytest.mark.parametrize("use_prefix", [True, False])
def test_single_group(dj40, tmp_path, smooth_img, use_prefix):
    _roundtrip(dj40, tmp_path, smooth_img, EncodeOptions(use_prefix=use_prefix))


@pytest.mark.parametrize("predictor", [0, 1, 2, 3, 4, 5])
def test_predictors(dj40, tmp_path, smooth_img, predictor):
    _roundtrip(dj40, tmp_path, smooth_img, EncodeOptions(predictor=predictor))


@pytest.mark.parametrize("use_prefix", [True, False])
def test_multi_group(dj40, tmp_path, use_prefix):
    rng = np.random.default_rng(7)
    img = (
        np.cumsum(np.cumsum(rng.integers(-2, 3, size=(300, 600, 3)), axis=0), axis=1)
        % 256
    ).astype(np.uint8)
    _roundtrip(dj40, tmp_path, img, EncodeOptions(use_prefix=use_prefix))


def test_odd_dimensions(dj40, tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(37, 53, 3)).astype(np.uint8)
    _roundtrip(dj40, tmp_path, img)


def test_noise_image(dj40, tmp_path):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(64, 64, 3)).astype(np.uint8)
    _roundtrip(dj40, tmp_path, img, EncodeOptions(use_prefix=False))


def test_flat_image(dj40, tmp_path):
    img = np.full((16, 16, 3), 128, dtype=np.uint8)
    _roundtrip(dj40, tmp_path, img)


def test_gradient_image(dj40, tmp_path):
    y = np.arange(128, dtype=np.int32)[:, None, None]
    x = np.arange(96, dtype=np.int32)[None, :, None]
    img = np.broadcast_to((y + 2 * x) % 256, (128, 96, 3)).astype(np.uint8).copy()
    _roundtrip(dj40, tmp_path, img)


def test_small_group_size(dj40, tmp_path):
    rng = np.random.default_rng(9)
    img = (np.cumsum(rng.integers(-2, 3, size=(200, 260, 3)), axis=1) % 256).astype(
        np.uint8
    )
    # group_size_shift 7 -> 128px groups: 3x2 grid
    _roundtrip(dj40, tmp_path, img, EncodeOptions(group_size_shift=7))


def test_native_core_matches_python(dj40, tmp_path, smooth_img):
    # the C++ host core and the pure-Python oracle must agree bit-exactly
    import os

    cs = encode_modular(smooth_img, options=EncodeOptions(use_prefix=False))
    os.environ["J40T_NATIVE"] = "1"
    _, a = decode_file(cs)
    os.environ["J40T_NATIVE"] = "0"
    try:
        _, b = decode_file(cs)
    finally:
        os.environ["J40T_NATIVE"] = "1"
    np.testing.assert_array_equal(a, b)


def test_alpha_channel(dj40, tmp_path):
    rng = np.random.default_rng(1)
    img = (np.cumsum(rng.integers(-3, 4, size=(24, 32, 4)), axis=1) % 256).astype(
        np.uint8
    )
    cs = encode_modular(img)
    ref = _dj40_decode(dj40, cs, tmp_path)
    _, rgba = decode_file(cs)
    np.testing.assert_array_equal(rgba, ref)
    np.testing.assert_array_equal(rgba, img)


def test_12bpp(dj40, tmp_path):
    rng = np.random.default_rng(2)
    img = (np.cumsum(rng.integers(-20, 21, size=(24, 32, 3)), axis=1) % 4096).astype(
        np.int32
    )
    cs = encode_modular(img, bpp=12)
    ref = _dj40_decode(dj40, cs, tmp_path)
    _, rgba = decode_file(cs)
    np.testing.assert_array_equal(rgba, ref)


def test_permuted_toc(dj40, tmp_path):
    rng = np.random.default_rng(3)
    img = (
        np.cumsum(np.cumsum(rng.integers(-2, 3, size=(300, 520, 3)), axis=0), axis=1)
        % 256
    ).astype(np.uint8)
    cs = encode_modular(img, options=EncodeOptions(permute_toc=True))
    ref = _dj40_decode(dj40, cs, tmp_path)
    _, rgba = decode_file(cs)
    np.testing.assert_array_equal(rgba, ref)
    np.testing.assert_array_equal(rgba[:, :, :3], img)


@pytest.mark.parametrize("use_prefix", [True, False])
def test_lz77_rle(dj40, tmp_path, use_prefix):
    # distance-1 runs (RLE-style LZ77); exercises window copy in all decoders
    rng = np.random.default_rng(8)
    img = np.repeat(
        np.repeat((rng.integers(0, 8, size=(16, 20, 3)) * 32).astype(np.uint8), 4, 0),
        4,
        1,
    )
    opt = EncodeOptions(use_prefix=use_prefix, lz77=True, predictor=0)
    _roundtrip(dj40, tmp_path, img, opt)


@pytest.mark.parametrize("use_prefix", [True, False])
def test_lz77_special_distances(dj40, tmp_path, use_prefix):
    # vertical copies via the special-distance table entry (0, 1)
    rng = np.random.default_rng(9)
    row = rng.integers(0, 256, size=(1, 64, 3)).astype(np.uint8)
    img = np.repeat(row, 48, axis=0).copy()
    img[13] = 255 - img[13]
    opt = EncodeOptions(use_prefix=use_prefix, lz77=True, predictor=0)
    _roundtrip(dj40, tmp_path, img, opt)


def test_grayscale(dj40, tmp_path):
    # grayscale modular: the reference rejects it (render requires 3 channels);
    # we decode it, replicating the single channel across RGB
    rng = np.random.default_rng(6)
    g = (np.cumsum(rng.integers(-3, 4, size=(32, 40, 1)), axis=1) % 256).astype(
        np.uint8
    )
    cs = encode_modular(g)
    _, rgba = decode_file(cs)
    np.testing.assert_array_equal(rgba[:, :, 0], g[:, :, 0])
    np.testing.assert_array_equal(rgba[:, :, 0], rgba[:, :, 1])
    # dj40 rejects grayscale with its TODO error
    jxl = tmp_path / "g.jxl"
    jxl.write_bytes(cs)
    r = subprocess.run([str(dj40), str(jxl)], capture_output=True, text=True)
    assert r.returncode != 0


def test_grayscale_with_alpha():
    rng = np.random.default_rng(7)
    g = (np.cumsum(rng.integers(-3, 4, size=(24, 24, 2)), axis=1) % 256).astype(
        np.uint8
    )
    cs = encode_modular(g)
    _, rgba = decode_file(cs)
    np.testing.assert_array_equal(rgba[:, :, 0], g[:, :, 0])
    np.testing.assert_array_equal(rgba[:, :, 3], g[:, :, 1])


def test_lz77_long_runs_ans(dj40, tmp_path):
    # runs longer than the ANS alphabet's token range must split into
    # multiple copy pairs (regression: length token 224+lt overflowed the
    # 256-entry ANS table on large uniform images)
    img = np.full((180, 190, 3), 77, np.uint8)
    img[90:, :] = 200
    for use_prefix in (False, True):
        opt = EncodeOptions(use_prefix=use_prefix, lz77=True, predictor=0)
        _roundtrip(dj40, tmp_path, img, opt)


@pytest.mark.parametrize("bpp", [1, 2, 4, 6])
def test_low_bpp_render(bpp):
    """bpp < 8 renders with the generic scale-to-depth math (beyond the
    reference, which rejects bpp < 8 at render, j40.h:7919)."""
    maxv = (1 << bpp) - 1
    rng = np.random.default_rng(bpp)
    img = rng.integers(0, maxv + 1, (40, 56, 3)).astype(np.uint8)
    cs = encode_modular(img, bpp=bpp)
    _, out = decode_file(cs)
    half = 1 << (bpp - 1)
    exp = ((img.astype(np.int64) * 255 + half) // maxv).astype(np.uint8)
    assert np.array_equal(out[:, :, :3], exp)


@pytest.mark.parametrize("use_prefix", [True, False])
def test_multi_group_global_tree(dj40, tmp_path, use_prefix):
    """Global tree + shared code spec across sections (cjxl -e2+ shape;
    j40.h:6320-6336) — also the decoder's device-batch fast path."""
    rng = np.random.default_rng(8)
    img = (
        np.cumsum(np.cumsum(rng.integers(-2, 3, size=(300, 600, 3)), axis=0),
                  axis=1) % 256
    ).astype(np.uint8)
    _roundtrip(dj40, tmp_path, img,
               EncodeOptions(use_prefix=use_prefix, global_tree=True))
