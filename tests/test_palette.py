"""Palette transform differential tests (reference j40.h:4402-4490): our
encoder/synthesizer generates palette streams, our decoder and dj40 must
agree bit-exactly — covering literal palettes, built-in delta indices,
synthetic out-of-range colors, and delta-palette prediction."""

import numpy as np
import pytest

from j40_tpu.decode import decode_file
from j40_tpu.encode.advanced import (
    AdvancedOptions,
    encode_modular_advanced,
    synthesize_palette,
)


def _dj40_decode(dj40, jxl_bytes, tmp_path):
    import subprocess

    from PIL import Image as PILImage

    jxl = tmp_path / "t.jxl"
    jxl.write_bytes(jxl_bytes)
    png = tmp_path / "t.png"
    r = subprocess.run([str(dj40), str(jxl), str(png)], capture_output=True, text=True)
    assert r.returncode == 0, f"dj40 failed: {r.stderr} {r.stdout}"
    return np.asarray(PILImage.open(png).convert("RGB"))



def _paletted_image(seed, h=40, w=48, ncolors=17):
    rng = np.random.default_rng(seed)
    colors = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, size=(h, w))
    return colors[idx]


def test_palette_roundtrip():
    img = _paletted_image(1)
    data = encode_modular_advanced(img, options=AdvancedOptions(palette=True))
    _, rgba = decode_file(data)
    np.testing.assert_array_equal(rgba[:, :, :3], img)


def test_palette_vs_dj40(dj40, tmp_path):
    img = _paletted_image(2)
    data = encode_modular_advanced(img, options=AdvancedOptions(palette=True))
    ref = _dj40_decode(dj40, data, tmp_path)
    np.testing.assert_array_equal(ref, img)


def test_palette_multigroup_vs_dj40(dj40, tmp_path):
    img = _paletted_image(3, 300, 280, ncolors=50)
    data = encode_modular_advanced(
        img, options=AdvancedOptions(palette=True, group_size_shift=7)
    )
    ref = _dj40_decode(dj40, data, tmp_path)
    _, rgba = decode_file(data)
    np.testing.assert_array_equal(ref, img)
    np.testing.assert_array_equal(rgba[:, :, :3], img)


def _differential(dj40, tmp_path, data):
    ref = _dj40_decode(dj40, data, tmp_path)
    _, rgba = decode_file(data)
    np.testing.assert_array_equal(rgba[:, :, :3], ref)


def test_synthetic_colors_vs_dj40(dj40, tmp_path):
    # indices >= nb_colours produce base-4/base-5 synthetic colors
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, size=(3, 8)).astype(np.int32)
    idx = rng.integers(0, 8 + 100, size=(24, 32)).astype(np.int32)
    _differential(dj40, tmp_path, synthesize_palette(pal, idx))


def test_builtin_delta_indices_vs_dj40(dj40, tmp_path):
    # negative indices index the hardcoded 143-delta table
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, size=(3, 16)).astype(np.int32)
    idx = rng.integers(-72, 16, size=(24, 32)).astype(np.int32)
    _differential(dj40, tmp_path, synthesize_palette(pal, idx))


@pytest.mark.parametrize("d_pred", [0, 5, 6])
def test_delta_palette_prediction_vs_dj40(dj40, tmp_path, d_pred):
    # indices < nb_deltas add the channel predictor (incl. WP, d_pred=6)
    rng = np.random.default_rng(6 + d_pred)
    pal = rng.integers(-20, 21, size=(3, 24)).astype(np.int32)
    idx = rng.integers(0, 24, size=(24, 32)).astype(np.int32)
    _differential(dj40, tmp_path,
                  synthesize_palette(pal, idx, nb_deltas=12, d_pred=d_pred))


def test_icc_stream_roundtrip_and_vs_dj40(dj40, tmp_path):
    # entropy-coded ICC payload (spec §14): our decoder returns it, dj40
    # decodes past it and still produces the image bit-exactly
    from j40_tpu.encode.encoder import encode_modular

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    payload = bytes(rng.integers(0, 256, 700, dtype=np.uint8))
    data = encode_modular(img, icc=payload)
    dec, rgba = decode_file(data)
    assert dec.image.want_icc and dec.image.icc == payload
    np.testing.assert_array_equal(rgba[:, :, :3], img)
    ref = _dj40_decode(dj40, data, tmp_path)
    np.testing.assert_array_equal(ref, img)


def test_icc_stream_tiny_payload(dj40, tmp_path):
    from j40_tpu.encode.encoder import encode_modular

    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    data = encode_modular(img, icc=b"\x00\x01\x02")
    dec, rgba = decode_file(data)
    assert dec.image.icc == b"\x00\x01\x02"
    ref = _dj40_decode(dj40, data, tmp_path)
    np.testing.assert_array_equal(ref, img)


def test_custom_m_lf_scaled_vs_dj40(dj40, tmp_path):
    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct

    rng = np.random.default_rng(11)
    img = (np.cumsum(np.cumsum(rng.integers(-2, 3, (64, 72, 3)), 0), 1) % 200
           + 20).astype(np.uint8)
    opt = VarDCTOptions(m_lf_scaled=(1.0 / 2048.0, 1.0 / 512.0, 1.0 / 128.0))
    data = encode_vardct(img, opt)
    ref = _dj40_decode(dj40, data, tmp_path)
    _, rgba = decode_file(data)
    assert np.abs(rgba[:, :, :3].astype(int) - ref.astype(int)).max() <= 1


def test_custom_restoration_params_vs_dj40(dj40, tmp_path):
    # non-default RestorationFilter fields must parse identically (both
    # decoders skip applying them by default)
    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct

    rng = np.random.default_rng(12)
    img = (np.cumsum(np.cumsum(rng.integers(-2, 3, (48, 56, 3)), 0), 1) % 200
           + 20).astype(np.uint8)
    data = encode_vardct(img, VarDCTOptions(custom_restoration=True))
    ref = _dj40_decode(dj40, data, tmp_path)
    dec, rgba = decode_file(data)
    assert np.abs(rgba[:, :, :3].astype(int) - ref.astype(int)).max() <= 1
    # parsed values round-tripped
    f = dec.frame.header
    assert f.epf_sharp_lut == [i / 8.0 for i in range(8)]
    assert f.epf_quant_mul == 0.5 and f.epf_pass0_sigma_scale == 0.875


def test_frame_extensions_skipped_vs_dj40(dj40, tmp_path):
    from j40_tpu.encode.encoder import EncodeOptions, encode_modular

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    data = encode_modular(img, options=EncodeOptions(frame_extension_bits=77))
    ref = _dj40_decode(dj40, data, tmp_path)
    np.testing.assert_array_equal(ref, img)
    _, rgba = decode_file(data)
    np.testing.assert_array_equal(rgba[:, :, :3], img)


def test_custom_opsin_matrix_vs_dj40(dj40, tmp_path):
    # custom opsin inverse matrix / biases (default_m=0): both decoders must
    # reconstruct identically (±1) from the same stored f16 values
    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct

    inv_mat = ((11.0, -9.875, -0.15625),
               (-3.25, 4.4375, -0.15625),
               (-3.65625, 2.71875, 1.953125))
    bias = (-0.0037841796875,) * 3
    quant_bias = (0.14453125, 0.1640625, 0.1416015625)
    opsin = (inv_mat, bias, quant_bias, 0.145263671875)
    rng = np.random.default_rng(14)
    img = (np.cumsum(np.cumsum(rng.integers(-2, 3, (48, 56, 3)), 0), 1) % 200
           + 20).astype(np.uint8)
    data = encode_vardct(img, VarDCTOptions(opsin=opsin))
    ref = _dj40_decode(dj40, data, tmp_path)
    dec, rgba = decode_file(data)
    assert dec.image.opsin_inv_mat[0][0] == 11.0
    assert np.abs(rgba[:, :, :3].astype(int) - ref.astype(int)).max() <= 1
    # device path consumes the same custom constants
    _, rgba_jax = decode_file(data, backend="jax")
    assert np.abs(rgba_jax[:, :, :3].astype(int) - ref.astype(int)).max() <= 1


def test_custom_intensity_target_vs_dj40(dj40, tmp_path):
    # ToneMapping intensity target scales the XYB->sRGB output (255/target)
    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct

    rng = np.random.default_rng(15)
    img = (np.cumsum(np.cumsum(rng.integers(-2, 3, (48, 56, 3)), 0), 1) % 200
           + 20).astype(np.uint8)
    data = encode_vardct(img, VarDCTOptions(intensity_target=512.0))
    ref = _dj40_decode(dj40, data, tmp_path)
    dec, rgba = decode_file(data)
    assert dec.image.intensity_target == 512.0
    assert np.abs(rgba[:, :, :3].astype(int) - ref.astype(int)).max() <= 1
    # visibly dimmer than the default-target encode of the same image
    base = decode_file(encode_vardct(img))[1]
    assert rgba[:, :, :3].mean() < base[:, :, :3].mean() * 0.8


def test_declared_extra_channels_vs_dj40(dj40, tmp_path):
    # explicitly-declared extra channels (depth, spot colour, named) parse and
    # decode in both decoders; alpha is found by type, not position
    from j40_tpu.encode.encoder import encode_modular

    rng = np.random.default_rng(16)
    img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    depth = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    spot = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    # NOTE: names must be empty for the dj40 cross-check — the reference's
    # UTF-8 verifier has an off-by-one that rejects every nonempty name
    # (j40.h:3067, `i + c < len` strict); named channels are covered in
    # test_named_channels_ours below
    data = encode_modular(img, extra_channels=[
        ({"type": 1}, depth),
        ({"type": 2, "spot": (1.0, 0.75, 0.0, 0.5)}, spot),
    ])
    ref = _dj40_decode(dj40, data, tmp_path)
    np.testing.assert_array_equal(ref, img)
    dec, rgba = decode_file(data)
    np.testing.assert_array_equal(rgba[:, :, :3], img)
    assert [e.type for e in dec.image.ec_info] == [1, 2]
    assert dec.image.ec_info[1].spot[1] == 0.75
    # the declared planes decode losslessly as gmodular channels
    np.testing.assert_array_equal(dec.frame.gmodular.channels[3].data, depth)
    np.testing.assert_array_equal(dec.frame.gmodular.channels[4].data, spot)


def test_declared_alpha_vs_dj40(dj40, tmp_path):
    from j40_tpu.encode.encoder import encode_modular

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    a = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    data = encode_modular(img, extra_channels=[
        ({"type": 0, "alpha_associated": 0}, a),
    ])
    ref = _dj40_decode(dj40, data, tmp_path)
    np.testing.assert_array_equal(ref, img)
    dec, rgba = decode_file(data)
    np.testing.assert_array_equal(rgba[:, :, 3], a)  # rendered as the alpha


def test_named_channels_ours():
    # spec-valid UTF-8 names (the reference rejects all nonempty names due to
    # its off-by-one; we accept them per spec)
    from j40_tpu.encode.encoder import encode_modular

    rng = np.random.default_rng(18)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    d = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    data = encode_modular(img, extra_channels=[
        ({"type": 1, "name": "dépth µap"}, d),
    ])
    dec, rgba = decode_file(data)
    assert dec.image.ec_info[0].name == "dépth µap"
    np.testing.assert_array_equal(rgba[:, :, :3], img)


def test_ycbcr_roundtrip_ours():
    # do_ycbcr frames render via BT.601 (the reference refuses: j40.h:7867)
    from j40_tpu.encode.encoder import EncodeOptions, encode_modular

    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, size=(32, 40, 3), dtype=np.uint8)
    data = encode_modular(img, options=EncodeOptions(ycbcr=True))
    dec, rgba = decode_file(data)
    assert dec.frame.header.do_ycbcr
    # forward+inverse rounding: within 2 levels of the source
    assert np.abs(rgba[:, :, :3].astype(int) - img.astype(int)).max() <= 2


def test_ycbcr_reference_renders_unconverted(dj40, tmp_path):
    # documents the boundary: the reference only rejects YCbCr for VarDCT
    # frames (j40.h:7867 sits in the VarDCT combine driver); for modular
    # frames it silently renders the raw (Cb, Y, Cr) planes as RGB.  We
    # convert; it does not.
    from j40_tpu.encode.encoder import EncodeOptions, encode_modular

    rng = np.random.default_rng(20)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    data = encode_modular(img, options=EncodeOptions(ycbcr=True))
    ref = _dj40_decode(dj40, data, tmp_path)
    # dj40's output is the stored centered channels, clamped to [0, 255]
    r, g, b = (img[:, :, c].astype(np.float64) for c in range(3))
    cb = np.round(-0.168736 * r - 0.331264 * g + 0.5 * b)
    yv = np.round(0.299 * r + 0.587 * g + 0.114 * b) - 128
    cr = np.round(0.5 * r - 0.418688 * g - 0.081312 * b)
    stored = np.stack([cb, yv, cr], axis=-1)
    np.testing.assert_array_equal(ref, np.clip(stored, 0, 255).astype(np.uint8))


@pytest.mark.parametrize("codes", [(1, 0, 1), (2, 0, 2), (3, 0, 3)])
def test_ycbcr_chroma_subsampling_ours(codes):
    # 420/422/440 chroma (both rejected by the reference at j40.h:6749):
    # block-constant chroma round-trips exactly through subsample+replicate
    from j40_tpu.encode.encoder import EncodeOptions, encode_modular

    rng = np.random.default_rng(21)
    small = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(small, 2, 0), 2, 1)  # 2x2-constant blocks
    opt = EncodeOptions(ycbcr=True, ycbcr_subsample=codes)
    data = encode_modular(img, options=opt)
    dec, rgba = decode_file(data)
    assert dec.frame.header.jpeg_upsampling != 0
    ref = decode_file(encode_modular(img, options=EncodeOptions(ycbcr=True)))[1]
    np.testing.assert_array_equal(rgba, ref)


def test_high_bit_depth_32bit_buffers():
    # bpp > 15 uses 32-bit modular buffers, gated by Level-10 limits (the
    # reference's level-10 profile exists but is compiled out, j40.h:1177)
    from j40_tpu.encode.encoder import encode_modular
    from j40_tpu.errors import J40Error
    from j40_tpu.limits import MAIN_LV10

    rng = np.random.default_rng(22)
    img20 = rng.integers(0, 1 << 20, size=(24, 32, 3))
    data = encode_modular(img20, bpp=20)
    # level-5 limits reject 32-bit buffer streams ("fm32")
    with pytest.raises(J40Error):
        decode_file(data)
    dec, rgba = decode_file(data, limits=MAIN_LV10)
    # lossless in the decoded planes; rgba is the scaled 8-bit rendering
    for c in range(3):
        np.testing.assert_array_equal(dec.frame.gmodular.channels[c].data,
                                      img20[:, :, c])
    maxv = (1 << 20) - 1
    expect = ((img20.astype(np.int64) * 255 + (1 << 19)) // maxv).astype(np.uint8)
    np.testing.assert_array_equal(rgba[:, :, :3], expect)


def test_container_wrapping_vs_dj40(dj40, tmp_path):
    # jxlc, split jxlp, jxll, and unknown boxes all round-trip through both
    # decoders (container write side: io/container.py::wrap_container)
    from j40_tpu.encode.encoder import encode_modular
    from j40_tpu.io.container import wrap_container

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    cs = encode_modular(img)
    for kwargs in (
        {},
        {"jxlp_parts": 3},
        {"level": 5},
        {"extra_boxes": [(b"Exif", b"\x00" * 32), (b"xml ", b"<x/>")]},
        {"jxlp_parts": 2, "level": 5, "extra_boxes": [(b"joke", b"hi")]},
    ):
        data = wrap_container(cs, **kwargs)
        ref = _dj40_decode(dj40, data, tmp_path)
        np.testing.assert_array_equal(ref, img)
        dec, rgba = decode_file(data)
        np.testing.assert_array_equal(rgba[:, :, :3], img)
        assert not dec.src.is_bare


def test_permuted_toc_across_jxlp_parts(dj40, tmp_path):
    # documents a reference limitation: dj40 cannot seek a permuted TOC
    # across >= 3 jxlp parts (j40.h:1905 "TODO honor containers"); our
    # contiguous-codestream container design decodes these
    import subprocess

    from j40_tpu.encode.encoder import EncodeOptions, encode_modular
    from j40_tpu.io.container import wrap_container

    # this specific stream/part-count combination makes dj40 fail (whether it
    # does depends on where the part boundaries land relative to the permuted
    # section offsets)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 1 << 12, (127, 183, 3)).astype(np.int32)
    cs = encode_modular(img, bpp=12, options=EncodeOptions(group_size_shift=7,
                                                           permute_toc=True))
    ok2 = wrap_container(cs, jxlp_parts=2)
    ref = _dj40_decode(dj40, ok2, tmp_path)
    maxv = (1 << 12) - 1
    expect = ((img.astype(np.int64) * 255 + (1 << 11)) // maxv).astype(np.uint8)
    np.testing.assert_array_equal(ref, expect)

    broken3 = wrap_container(cs, jxlp_parts=3)
    jxl = tmp_path / "p3.jxl"
    jxl.write_bytes(broken3)
    r = subprocess.run([str(dj40), str(jxl), str(tmp_path / "p3.png")],
                       capture_output=True, text=True)
    assert r.returncode != 0  # the reference cannot
    _, rgba = decode_file(broken3)  # we can
    np.testing.assert_array_equal(rgba[:, :, :3], expect)


def test_alpha_high_bpp_beyond_reference():
    # dj40 TODO-rejects alpha with bpp > 8; we decode it
    from j40_tpu.encode.encoder import encode_modular

    rng = np.random.default_rng(71)
    img = rng.integers(0, 1 << 12, (20, 24, 4)).astype(np.int32)
    data = encode_modular(img, bpp=12)
    dec, rgba = decode_file(data)
    maxv = (1 << 12) - 1
    expect = ((img.astype(np.int64) * 255 + (1 << 11)) // maxv).astype(np.uint8)
    np.testing.assert_array_equal(rgba, expect)


def test_spot_colour_rendering():
    # opt-in spot colour compositing: channels mix over the color planes
    # weighted by solidity x value (default off = dj40 render parity)
    from j40_tpu.encode.encoder import encode_modular

    img = np.full((8, 8, 3), 100, np.uint8)
    spot = np.zeros((8, 8), np.uint8)
    spot[2:6, 2:6] = 255  # full-strength square
    from j40_tpu.decode import Decoder

    data = encode_modular(img, extra_channels=[
        ({"type": 2, "spot": (1.0, 0.0, 0.0, 0.5)}, spot),
    ])
    dec = Decoder(data, render_spot=True)
    dec.decode_frame()
    rgba = dec.render_rgba8()
    # outside the square: untouched
    assert (rgba[0, 0, :3] == [100, 100, 100]).all()
    # inside: 50% mix toward pure red (solidity 0.5 at value 1.0)
    px = rgba[3, 3, :3].astype(float)
    assert abs(px[0] - (255 * 0.5 + 100 * 0.5)) <= 1
    assert abs(px[1] - 50) <= 1 and abs(px[2] - 50) <= 1


@pytest.mark.parametrize("rct_type", [6, 0, 13])
def test_palette_after_rct_chain_vs_dj40(dj40, tmp_path, rct_type):
    # transform chain [RCT, Palette]: the decoder inverts palette first,
    # then RCT — bit-exact against dj40
    img = _paletted_image(30 + rct_type, ncolors=12)
    data = encode_modular_advanced(
        img, options=AdvancedOptions(palette=True, rct_type=rct_type))
    ref = _dj40_decode(dj40, data, tmp_path)
    np.testing.assert_array_equal(ref, img)
    _, rgba = decode_file(data)
    np.testing.assert_array_equal(rgba[:, :, :3], img)
