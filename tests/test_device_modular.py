"""End-to-end device-backend modular decode: backend="device" routes pass
groups through the lockstep device entropy + wavefront kernels and must stay
bit-exact vs the host path and the dj40 oracle (VERDICT r1 item 1)."""

import subprocess

import numpy as np
import pytest
from PIL import Image

from j40_tpu.decode import Decoder, decode_file
from j40_tpu.encode.encoder import EncodeOptions, encode_modular


def _img(h, w, nc=3, seed=7):
    rng = np.random.default_rng(seed)
    return (
        np.cumsum(np.cumsum(rng.integers(-2, 3, size=(h, w, nc)), axis=0), axis=1)
        % 256
    ).astype(np.uint8)


def _device_decode(cs):
    dec = Decoder(cs, backend="device")
    while not dec.done:
        dec.decode_frame()
    return dec, dec.render_rgba8()


def _assert_device_matches_host(cs, expect_device=True):
    dec, rgba = _device_decode(cs)
    _, ref = decode_file(cs)
    np.testing.assert_array_equal(rgba, ref, err_msg="device != host backend")
    dm = dec.stats.get("device_modular")
    if expect_device:
        assert dm and dm["lanes"] > 0, "device path never ran"
    else:
        assert dm is None, "device path ran on an ineligible stream"
    return dec, rgba


@pytest.mark.parametrize("use_prefix", [True, False])
def test_multi_group_device_vs_dj40(dj40, tmp_path, use_prefix):
    # 3x2 ragged group grid (128-px groups; 44-px right edge, 72-px bottom)
    img = _img(200, 300)
    cs = encode_modular(
        img, options=EncodeOptions(use_prefix=use_prefix, group_size_shift=7)
    )
    dec, rgba = _assert_device_matches_host(cs)
    assert dec.stats["device_modular"]["lanes"] == 6

    jxl = tmp_path / "t.jxl"
    png = tmp_path / "t.png"
    jxl.write_bytes(cs)
    r = subprocess.run(
        [str(dj40), str(jxl), str(png)], capture_output=True, text=True
    )
    assert r.returncode == 0, f"dj40 failed: {r.stderr} {r.stdout}"
    ref = np.asarray(Image.open(png).convert("RGBA"))
    np.testing.assert_array_equal(rgba, ref, err_msg="device != dj40 oracle")
    np.testing.assert_array_equal(rgba[:, :, :3], img)


@pytest.mark.parametrize("predictor", [0, 1, 2, 5])
def test_device_predictors(predictor):
    img = _img(150, 260, seed=predictor)
    cs = encode_modular(
        img,
        options=EncodeOptions(predictor=predictor, group_size_shift=7),
    )
    _assert_device_matches_host(cs)


def test_device_rgba_alpha():
    img = _img(140, 200, nc=4, seed=3)
    cs = encode_modular(img, options=EncodeOptions(group_size_shift=7))
    dec, rgba = _assert_device_matches_host(cs)
    np.testing.assert_array_equal(rgba, img)


def test_device_falls_back_on_lz77():
    # LZ77 streams are host-only; backend="device" must still decode right
    img = np.tile(np.arange(16, dtype=np.uint8), (130, 10))[:, :150]
    img = np.stack([img, img[::-1], img], axis=-1)
    cs = encode_modular(
        img, options=EncodeOptions(lz77=True, group_size_shift=7)
    )
    _assert_device_matches_host(cs, expect_device=False)


def test_device_falls_back_on_unsupported_predictor():
    img = _img(140, 200, seed=9)
    cs = encode_modular(
        img, options=EncodeOptions(predictor=4, group_size_shift=7)
    )
    _assert_device_matches_host(cs, expect_device=False)


def test_device_streaming_resume_parity():
    # the device path must respect section-granular resume bookkeeping
    img = _img(150, 260, seed=11)
    cs = encode_modular(img, options=EncodeOptions(group_size_shift=7))
    dec = Decoder(cs[: len(cs) // 2], backend="device", streaming=True)
    from j40_tpu.errors import ShortInput

    got_short = False
    try:
        dec.decode_frame()
    except ShortInput:
        got_short = True
    dec.push(cs[len(cs) // 2 :])
    dec.decode_frame()
    rgba = dec.render_rgba8()
    _, ref = decode_file(cs)
    np.testing.assert_array_equal(rgba, ref)
    assert got_short  # the split point really was mid-frame


@pytest.mark.parametrize("use_prefix,complex_map", [
    (True, False), (False, False), (False, True), (True, True)])
def test_device_multinode_static_tree(dj40, tmp_path, use_prefix, complex_map):
    # VERDICT r3 item 5: multi-node MA trees whose branches test only
    # STATIC properties (channel/stream/y/x) decode on device lanes — the
    # per-pixel context walk vectorizes on the host, per-token cluster ids
    # select LUT blocks inside the scan, and reconstruction runs the
    # per-pixel predictor wavefront.  complex_map=True adds a multi-cluster
    # code spec (contexts -> 2 clusters via the MTF-coded map).
    from j40_tpu.encode.advanced import AdvancedOptions, encode_modular_advanced
    from j40_tpu.encode.modular_enc import branch, leaf

    # 9-node tree (BFS wire order), 5 leaves -> 5 contexts; branches test
    # channel (0), x (3), y (2), and the per-section stream index (1)
    tree = [
        branch(0, 0, 1, 2),           # channel > 0 ?
        branch(3, 60, 3, 4),          # x > 60 ?
        branch(2, 40, 5, 6),          # y > 40 ?
        leaf(5),                      # chroma, right: gradient
        leaf(1),                      # chroma, left: W
        leaf(2),                      # luma, bottom: N
        branch(1, 25, 7, 8),          # stream index splits groups
        leaf(0),                      # zero predictor
        leaf(5, offset=3),            # nonzero leaf offset
    ]
    img = _img(200, 300, seed=17)
    cs = encode_modular_advanced(img, options=AdvancedOptions(
        tree=tree, use_prefix=use_prefix, complex_cluster_map=complex_map,
        group_size_shift=7))

    dec, rgba = _device_decode(cs)
    _, ref = decode_file(cs)
    np.testing.assert_array_equal(rgba, ref, err_msg="device != host backend")
    dm = dec.stats.get("device_modular")
    assert dm and dm.get("ctx_lanes", 0) > 0, "ctx device path never ran"
    if complex_map:
        assert dm["kernel"] == "scan-ctx"

    jxl = tmp_path / "t.jxl"
    png = tmp_path / "t.png"
    jxl.write_bytes(cs)
    r = subprocess.run(
        [str(dj40), str(jxl), str(png)], capture_output=True, text=True
    )
    assert r.returncode == 0, f"dj40 failed: {r.stderr} {r.stdout}"
    refpng = np.asarray(Image.open(png).convert("RGBA"))
    np.testing.assert_array_equal(rgba, refpng, err_msg="device != dj40")
    np.testing.assert_array_equal(rgba[:, :, :3], img)


@pytest.mark.parametrize("tree_spec", [
    # prop 7 = W: plain neighbor branch over wavefront predictors
    ("w_branch", [(7, 0, 1, 2), (-5,), (-1,)]),
    # prop 15 = WP max error gating WP vs gradient — the cjxl -e3 shape
    # (the modular_e3 bench stream's exact tree)
    ("e3_wp", [(15, 0, 1, 2), (-6,), (-5,)]),
    # prop 8 needs NWW; deeper tree mixing static + neighbor props
    ("mixed", [(0, 0, 1, 2), (8, 3, 3, 4), (-5,), (-2,), (-1,)]),
])
def test_device_neighbor_property_tree(tree_spec, dj40, tmp_path):
    # r5 (VERDICT weak #4): NEIGHBOR-property trees (j40.h:4177-4218)
    # decode on device lanes — tokens context-free (single cluster), the
    # tree walk evaluated inside the WP wavefront
    from j40_tpu.encode.advanced import AdvancedOptions, encode_modular_advanced
    from j40_tpu.encode.modular_enc import branch, leaf

    name, spec = tree_spec
    tree = [leaf(-n[0]) if n[0] < 0 else branch(*n) for n in spec]
    img = _img(150, 200, seed=19)
    cs = encode_modular_advanced(img, options=AdvancedOptions(
        tree=tree, group_size_shift=7))
    dec, rgba = _device_decode(cs)
    from j40_tpu.decode import decode_file

    _, ref = decode_file(cs)
    np.testing.assert_array_equal(rgba, ref, err_msg="device != host")
    dm = dec.stats.get("device_modular")
    assert dm and dm.get("ntree_lanes", 0) > 0, \
        "neighbor-property tree never hit the device tree-wavefront"

    jxl = tmp_path / "t.jxl"
    png = tmp_path / "t.png"
    jxl.write_bytes(cs)
    r = subprocess.run(
        [str(dj40), str(jxl), str(png)], capture_output=True, text=True)
    assert r.returncode == 0, f"dj40 failed: {r.stderr}"
    refpng = np.asarray(Image.open(png).convert("RGBA"))
    np.testing.assert_array_equal(rgba, refpng, err_msg="device != dj40")


def test_device_falls_back_on_ref_channel_tree():
    # cross-channel reference properties (>= 16) stay on the host path
    from j40_tpu.encode.advanced import AdvancedOptions, encode_modular_advanced
    from j40_tpu.encode.modular_enc import branch, leaf

    # prop 16 only reachable for channels > 0 (channel 0 has no refs)
    tree = [branch(0, 0, 1, 4), branch(16, 0, 2, 3), leaf(5), leaf(1),
            leaf(5)]
    img = _img(150, 200, seed=19)
    cs = encode_modular_advanced(img, options=AdvancedOptions(
        tree=tree, group_size_shift=7))
    _assert_device_matches_host(cs, expect_device=False)


def test_device_multinode_offset_multiplier():
    # leaf offset/multiplier arithmetic on device lanes: residuals are
    # val = unpack_signed(tok) * multiplier + offset + predict
    # (decode.py:400-402); construct data whose residuals are exactly
    # representable (predictor 0 => residual == sample value)
    from j40_tpu.encode.advanced import AdvancedOptions, encode_modular_advanced
    from j40_tpu.encode.modular_enc import branch, leaf

    tree = [
        branch(3, 60, 1, 2),            # x > 60 ?
        leaf(0, multiplier=4),          # right: values are multiples of 4
        leaf(0, offset=2, multiplier=2),  # left: values are 2 mod 2... even+2
    ]
    rng = np.random.default_rng(23)
    img = np.empty((96, 200, 3), np.uint8)
    # property 3 is x within the SECTION's sub-image: build the residual-
    # divisibility regions per 128-px group in local coordinates
    for g0 in (0, 128):
        w = min(200, g0 + 128) - g0
        right = max(0, w - 61)
        img[:, g0 + 61 : g0 + w] = rng.integers(0, 64, (96, right, 3)) * 4
        img[:, g0 : g0 + min(61, w)] = (
            rng.integers(0, 127, (96, min(61, w), 3)) * 2 + 2)
    cs = encode_modular_advanced(img, options=AdvancedOptions(
        tree=tree, group_size_shift=7))
    dec, rgba = _device_decode(cs)
    _, ref = decode_file(cs)
    np.testing.assert_array_equal(rgba, ref)
    dm = dec.stats.get("device_modular")
    assert dm and dm.get("ctx_lanes", 0) > 0
    np.testing.assert_array_equal(rgba[:, :, :3], img)


@pytest.mark.parametrize("use_prefix", [True, False])
def test_device_wp_single_leaf(dj40, tmp_path, use_prefix):
    # VERDICT r3 weak #3: the self-correcting (weighted) predictor on
    # device — single-leaf WP trees now run the d=2y+x WP wavefront
    # (ops/device_entropy.py::wp_reconstruct) instead of falling back
    from j40_tpu.encode.advanced import AdvancedOptions, encode_modular_advanced
    from j40_tpu.encode.modular_enc import leaf

    img = _img(150, 260, seed=29)
    cs = encode_modular_advanced(img, options=AdvancedOptions(
        tree=[leaf(6)], use_prefix=use_prefix, group_size_shift=7))
    dec, rgba = _assert_device_matches_host(cs)
    np.testing.assert_array_equal(rgba[:, :, :3], img)

    jxl = tmp_path / "t.jxl"
    png = tmp_path / "t.png"
    jxl.write_bytes(cs)
    r = subprocess.run(
        [str(dj40), str(jxl), str(png)], capture_output=True, text=True
    )
    assert r.returncode == 0, f"dj40 failed: {r.stderr} {r.stdout}"
    refpng = np.asarray(Image.open(png).convert("RGBA"))
    np.testing.assert_array_equal(rgba, refpng, err_msg="device != dj40")


def test_device_wp_custom_params(dj40, tmp_path):
    # non-default WP params flow from the sub-header into the device
    # wavefront (and the encoder now emits them: advanced._write_wp_params)
    from j40_tpu.encode.advanced import AdvancedOptions, encode_modular_advanced
    from j40_tpu.encode.modular_enc import leaf
    from j40_tpu.modular.wp import WPParams

    img = _img(120, 180, seed=31)
    params = WPParams(p1=9, p2=14, p3=(2, 11, 5, 1, 3), w=(11, 13, 14, 12))
    cs = encode_modular_advanced(img, options=AdvancedOptions(
        tree=[leaf(6)], wp_params=params, group_size_shift=7))
    dec, rgba = _assert_device_matches_host(cs)
    np.testing.assert_array_equal(rgba[:, :, :3], img)

    jxl = tmp_path / "t.jxl"
    png = tmp_path / "t.png"
    jxl.write_bytes(cs)
    r = subprocess.run(
        [str(dj40), str(jxl), str(png)], capture_output=True, text=True
    )
    assert r.returncode == 0, f"dj40 failed: {r.stderr} {r.stdout}"
    refpng = np.asarray(Image.open(png).convert("RGBA"))
    np.testing.assert_array_equal(rgba, refpng, err_msg="device != dj40")


def test_device_wp_in_static_tree(dj40, tmp_path):
    # multi-node static-property tree mixing WP with plain-wavefront AND
    # WP-wavefront-only predictors (4=select, 7=NE, 12=avg(N,NE)) — the
    # whole class routes through wp_reconstruct with a per-pixel pcode plane
    from j40_tpu.encode.advanced import AdvancedOptions, encode_modular_advanced
    from j40_tpu.encode.modular_enc import branch, leaf

    tree = [
        branch(0, 0, 1, 2),           # channel > 0 ?
        branch(3, 70, 3, 4),          # x > 70 ?
        branch(2, 50, 5, 6),          # y > 50 ?
        leaf(6),                      # chroma, right: WP
        leaf(4),                      # chroma, left: select
        leaf(7),                      # luma, bottom: NE
        leaf(12),                     # luma, top: avg(N, NE)
    ]
    img = _img(170, 260, seed=37)
    cs = encode_modular_advanced(img, options=AdvancedOptions(
        tree=tree, group_size_shift=7))
    dec, rgba = _device_decode(cs)
    _, ref = decode_file(cs)
    np.testing.assert_array_equal(rgba, ref, err_msg="device != host backend")
    dm = dec.stats.get("device_modular")
    assert dm and dm.get("ctx_lanes", 0) > 0, "ctx device path never ran"
    np.testing.assert_array_equal(rgba[:, :, :3], img)

    jxl = tmp_path / "t.jxl"
    png = tmp_path / "t.png"
    jxl.write_bytes(cs)
    r = subprocess.run(
        [str(dj40), str(jxl), str(png)], capture_output=True, text=True
    )
    assert r.returncode == 0, f"dj40 failed: {r.stderr} {r.stdout}"
    refpng = np.asarray(Image.open(png).convert("RGBA"))
    np.testing.assert_array_equal(rgba, refpng, err_msg="device != dj40")
