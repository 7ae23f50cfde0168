"""Advanced modular paths: custom MA trees, WP, RCT families, Squeeze
(reference j40.h:3899-4543; Squeeze per spec H.6, beyond the reference)."""

import subprocess

import numpy as np
import pytest
from PIL import Image

from j40_tpu.decode import decode_file
from j40_tpu.encode.advanced import AdvancedOptions, encode_modular_advanced
from j40_tpu.encode.modular_enc import (
    branch,
    forward_squeeze_h,
    leaf,
)
from j40_tpu.modular.transforms import _inv_squeeze_h


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(11)
    return (np.cumsum(rng.integers(-3, 4, size=(48, 56, 3)), axis=1) % 256).astype(
        np.uint8
    )


def _check_vs_dj40(dj40, tmp_path, img, cs, rgba):
    jxl = tmp_path / "t.jxl"
    png = tmp_path / "t.png"
    jxl.write_bytes(cs)
    r = subprocess.run([str(dj40), str(jxl), str(png)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ref = np.asarray(Image.open(png).convert("RGBA"))
    np.testing.assert_array_equal(rgba, ref)


def _roundtrip(img, opt):
    cs = encode_modular_advanced(img, options=opt)
    _, rgba = decode_file(cs)
    np.testing.assert_array_equal(rgba[:, :, :3], img)
    return cs, rgba


@pytest.mark.parametrize("rct_type", [0, 1, 6, 7, 13, 20, 28, 35, 41])
def test_rct_types(dj40, tmp_path, img, rct_type):
    cs, rgba = _roundtrip(img, AdvancedOptions(rct_type=rct_type))
    _check_vs_dj40(dj40, tmp_path, img, cs, rgba)


def test_custom_tree(dj40, tmp_path, img):
    tree = [branch(9, 100, 1, 2), leaf(5), leaf(1)]
    cs, rgba = _roundtrip(img, AdvancedOptions(tree=tree))
    _check_vs_dj40(dj40, tmp_path, img, cs, rgba)


def test_tree_with_channel_property(dj40, tmp_path, img):
    # property 0 = channel index: different predictors per channel
    tree = [branch(0, 0, 1, 2), leaf(5), leaf(2)]
    cs, rgba = _roundtrip(img, AdvancedOptions(tree=tree))
    _check_vs_dj40(dj40, tmp_path, img, cs, rgba)


def test_weighted_predictor(dj40, tmp_path, img):
    cs, rgba = _roundtrip(img, AdvancedOptions(tree=[leaf(6)]))
    _check_vs_dj40(dj40, tmp_path, img, cs, rgba)


def test_tree_wp_property(dj40, tmp_path, img):
    tree = [branch(15, 0, 1, 2), leaf(6), leaf(5)]
    cs, rgba = _roundtrip(img, AdvancedOptions(tree=tree))
    _check_vs_dj40(dj40, tmp_path, img, cs, rgba)


def test_prev_channel_property(dj40, tmp_path, img):
    # property 16 = |rC| of the previous same-shape channel; only valid for
    # channels with a compatible predecessor ("trec" otherwise, j40.h:4205),
    # so gate it behind a channel-index split: cidx>0 -> left subtree
    tree = [branch(0, 0, 1, 2), branch(16, 10, 3, 4), leaf(2), leaf(5), leaf(1)]
    cs, rgba = _roundtrip(img, AdvancedOptions(tree=tree))
    _check_vs_dj40(dj40, tmp_path, img, cs, rgba)


def test_squeeze_single_group(img):
    # the reference rejects squeeze (j40.h:4518); self-roundtrip validates our
    # spec H.6 implementation
    _roundtrip(img, AdvancedOptions(squeeze=True))


def test_squeeze_odd_dims():
    rng = np.random.default_rng(23)
    img = (np.cumsum(rng.integers(-2, 3, size=(45, 51, 3)), axis=1) % 256).astype(
        np.uint8
    )
    _roundtrip(img, AdvancedOptions(squeeze=True))


def test_squeeze_roundtrip_unit():
    rng = np.random.default_rng(29)
    for w in (8, 9, 16, 17, 1, 2):
        full = rng.integers(-3000, 3000, size=(5, w)).astype(np.int32)
        down, res = forward_squeeze_h(full)
        back = _inv_squeeze_h(down, res)
        np.testing.assert_array_equal(back, full)


def test_squeeze_with_rct(img):
    _roundtrip(img, AdvancedOptions(squeeze=True, rct_type=6))


@pytest.mark.slow
def test_squeeze_multigroup():
    rng = np.random.default_rng(13)
    img = (
        np.cumsum(np.cumsum(rng.integers(-2, 3, size=(300, 520, 3)), axis=0), axis=1)
        % 256
    ).astype(np.uint8)
    _roundtrip(img, AdvancedOptions(squeeze=True))


@pytest.mark.parametrize("use_prefix", [True, False])
def test_complex_mtf_cluster_map_vs_dj40(dj40, tmp_path, use_prefix):
    """Cluster map via the nested-entropy + MTF encoding (j40.h:2550-2599):
    the decoder's recursive map path, unreachable from the simple-map
    encoder default."""
    from j40_tpu.encode.modular_enc import branch, leaf

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (96, 120, 3)).astype(np.uint8)
    tree = [branch(6, 100, 1, 2), branch(7, 100, 3, 4),
            leaf(5), leaf(2), leaf(1)]
    cs = encode_modular_advanced(
        img, options=AdvancedOptions(tree=tree, complex_cluster_map=True,
                                     use_prefix=use_prefix))
    _, rgba = decode_file(cs)
    np.testing.assert_array_equal(rgba[:, :, :3], img)
    _check_vs_dj40(dj40, tmp_path, img, cs, rgba)


def test_flat_ans_distributions_vs_dj40(dj40, tmp_path):
    """ANS mode-2 ("evenly distributed") tables — the decoder's flat branch
    (j40.h:2640-2649), unreachable from the histogram-normalizing default."""
    from j40_tpu.encode.modular_enc import branch, leaf

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (96, 128, 3)).astype(np.uint8)
    tree = [branch(6, 100, 1, 2), leaf(5), leaf(2)]
    cs = encode_modular_advanced(img, options=AdvancedOptions(
        tree=tree, use_prefix=False, flat_ans_dists=True))
    _, rgba = decode_file(cs)
    np.testing.assert_array_equal(rgba[:, :, :3], img)
    _check_vs_dj40(dj40, tmp_path, img, cs, rgba)


@pytest.mark.parametrize("shift", [11, 9, 6])
def test_ans_shift_quantized_tables_vs_dj40(dj40, tmp_path, shift):
    """Bit-counts shift < 13: table values quantize to the truncated
    extra-bits grid (j40.h:2680-2686) — the last read_ans_table branch."""
    from j40_tpu.encode.modular_enc import branch, leaf

    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, (96, 110, 3)).astype(np.uint8)
    tree = [branch(6, 100, 1, 2), leaf(5), leaf(2)]
    cs = encode_modular_advanced(img, options=AdvancedOptions(
        tree=tree, use_prefix=False, ans_shift=shift))
    _, rgba = decode_file(cs)
    np.testing.assert_array_equal(rgba[:, :, :3], img)
    _check_vs_dj40(dj40, tmp_path, img, cs, rgba)
