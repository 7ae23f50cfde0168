"""Multi-group / multi-LF-group mixed-DctSelect VarDCT streams vs the dj40
oracle (reference varblock placement j40.h:6636-6687, per-group HF sections
j40.h:6874-7043; BASELINE config-4 "variable blocks" shape)."""

import subprocess

import numpy as np
import pytest
from PIL import Image

from j40_tpu.decode import Decoder, decode_file
from j40_tpu.encode.vardct_enc import (
    encode_vardct_mixed,
    synthesize_vardct,
)
from j40_tpu.vardct.tables import DCT_SELECT


def _dj40(dj40, cs, tmp_path):
    jxl = tmp_path / "t.jxl"
    png = tmp_path / "t.png"
    jxl.write_bytes(cs)
    r = subprocess.run([str(dj40), str(jxl), str(png)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr + r.stdout
    return np.asarray(Image.open(png).convert("RGB")).astype(int)


def _random_mixed_stream(width, height, seed=3):
    """Random mixed-varblock stream: grid + tokens in decoder discovery
    order (per LF group raster, j40.h:6636)."""
    rng = np.random.default_rng(seed)
    h8, w8 = (height + 7) // 8, (width + 7) // 8
    grid = np.zeros((h8, w8), np.int64)
    covered = np.zeros((h8, w8), bool)
    choices = [(0, 1, 1), (4, 2, 2), (5, 4, 4), (6, 2, 1), (7, 1, 2)]
    for y in range(h8):
        for x in range(w8):
            if covered[y, x]:
                continue
            ok = []
            for sel, vh8, vw8 in choices:
                if (
                    y + vh8 <= h8 and x + vw8 <= w8
                    and not covered[y : y + vh8, x : x + vw8].any()
                    and (y % 256) + vh8 <= 256 and (x % 256) + vw8 <= 256
                    and ((x % 256) >> 5) == (((x % 256) + vw8 - 1) >> 5)
                    and ((y % 256) >> 5) == (((y % 256) + vh8 - 1) >> 5)
                ):
                    ok.append((sel, vh8, vw8))
            sel, vh8, vw8 = ok[rng.integers(len(ok))]
            covered[y : y + vh8, x : x + vw8] = True
            grid[y, x] = sel

    tokens = []
    cov2 = np.zeros((h8, w8), bool)
    gg_cols, gg_rows = (w8 + 255) // 256, (h8 + 255) // 256
    for ggr in range(gg_rows):
        for ggc in range(gg_cols):
            for y in range(ggr * 256, min(ggr * 256 + 256, h8)):
                for x in range(ggc * 256, min(ggc * 256 + 256, w8)):
                    if cov2[y, x]:
                        continue
                    sel = int(grid[y, x])
                    lh, lw, _, _ = DCT_SELECT[sel]
                    cov2[y : y + (1 << (lh - 3)), x : x + (1 << (lw - 3))] = True
                    size = 1 << (lh + lw)
                    tokens.append([
                        np.where(rng.random(size) < 0.8, 0,
                                 rng.integers(-5, 6, size))
                        for _ in range(3)
                    ])
    lf = rng.integers(-20, 21, (3, h8, w8))
    return synthesize_vardct(width, height, grid, lf, tokens)


@pytest.mark.parametrize("width,height", [(640, 384), (2304, 128)])
def test_multigroup_mixed_synthesize(dj40, tmp_path, width, height):
    """Mixed DctSelects across several 256px groups (and, for 2304px width,
    two LF groups): decoder-vs-decoder differential."""
    cs = _random_mixed_stream(width, height)
    ref = _dj40(dj40, cs, tmp_path)
    _, ours = decode_file(cs)
    assert np.abs(ours[:, :, :3].astype(int) - ref).max() <= 1


@pytest.fixture(scope="module")
def flatphoto():
    rng = np.random.default_rng(777)
    h, w = 384, 512
    img = (np.cumsum(np.cumsum(rng.integers(-2, 3, size=(h, w, 3)), 0), 1)
           % 200 + 20).astype(np.uint8)
    img[:128, :256] = img[10, 10]                      # flat -> 32x32 blocks
    img[256:, 384:] = (np.linspace(40, 80, 128)[:, None, None]
                       + np.zeros((128, 128, 3))).astype(np.uint8)
    return img


def test_encode_mixed_vs_dj40(dj40, tmp_path, flatphoto):
    stats: dict = {}
    cs = encode_vardct_mixed(flatphoto, stats_out=stats)
    # the chooser must actually produce a mixed layout
    assert stats["dctsel_counts"].get(0, 0) > 0
    assert sum(stats["dctsel_counts"].get(s, 0) for s in (4, 5, 6, 7)) > 4, stats
    ref = _dj40(dj40, cs, tmp_path)
    _, ours = decode_file(cs)
    assert np.abs(ours[:, :, :3].astype(int) - ref).max() <= 1
    # PSNR >= dj40's (both decode the same stream; gate vs source)
    err = ours[:, :, :3].astype(float) - flatphoto
    psnr = 10 * np.log10(255**2 / np.mean(err**2))
    derr = ref.astype(float) - flatphoto
    dpsnr = 10 * np.log10(255**2 / np.mean(derr**2))
    assert psnr >= dpsnr - 0.05 and psnr > 28, (psnr, dpsnr)


def test_encode_mixed_custom_order_vs_dj40(dj40, tmp_path, flatphoto):
    # mixed layout + Lehmer-permuted order 0: the permuted DCT8 cells and
    # the natural-order big classes must coexist (regression: the mixed
    # collector once emitted 8x8 coefficients in natural order while the
    # header signaled the permutation)
    from j40_tpu.encode.vardct_enc import VarDCTOptions

    cs = encode_vardct_mixed(flatphoto, options=VarDCTOptions(custom_order=True))
    ref = _dj40(dj40, cs, tmp_path)
    _, ours = decode_file(cs)
    assert np.abs(ours[:, :, :3].astype(int) - ref).max() <= 1
    err = ours[:, :, :3].astype(float) - flatphoto
    psnr = 10 * np.log10(255**2 / np.mean(err**2))
    assert psnr > 28, psnr


def test_encode_mixed_jax_backend(dj40, tmp_path, flatphoto):
    """The device reconstruction path on a mixed multi-group stream."""
    cs = encode_vardct_mixed(flatphoto)
    ref = _dj40(dj40, cs, tmp_path)
    dec = Decoder(cs, backend="jax")
    dec.decode_frame()
    out = dec.render_rgba8()
    assert np.abs(out[:, :, :3].astype(int) - ref).max() <= 1


def test_fused_mixed_pallas_interp(dj40, tmp_path, flatphoto, monkeypatch):
    """The single-dispatch fused mixed-class path (dense 8x8 grid through the
    Pallas kernel + per-class overlays), exercised in interpreter mode."""
    monkeypatch.setenv("J40T_PALLAS", "interp")
    cs = encode_vardct_mixed(flatphoto)
    ref = _dj40(dj40, cs, tmp_path)
    dec = Decoder(cs, backend="jax")
    dec.decode_frame()
    out = dec.render_rgba8()
    assert np.abs(out[:, :, :3].astype(int) - ref).max() <= 1


def test_pipelined_multi_lf_group_dispatch(dj40, tmp_path):
    """Multi-LF-group stream with workers>1: per-LF-group reconstructions
    dispatch from the decode threads (dispatch_group_async) and must match
    dj40; width 2560 > 2048 gives two LF groups."""
    rng = np.random.default_rng(21)
    img = np.cumsum(rng.integers(-2, 3, (128, 2560, 3)), axis=1).astype(np.uint8)
    cs = encode_vardct_mixed(img)
    ref = _dj40(dj40, cs, tmp_path)
    dec = Decoder(cs, backend="jax", workers=4)
    dec.decode_frame()
    out = dec.render_rgba8()
    assert np.abs(out[:, :, :3].astype(int) - ref).max() <= 1


def test_xyb_pallas_full_lf_group_shape(monkeypatch):
    """The pointwise XYB kernel at a full 2048-wide LF-group shape (a fixed
    256-row stripe OOMed scoped VMEM on hardware; stripes now adapt)."""
    import jax.numpy as jnp

    from j40_tpu.ops.pallas_kernels import xyb_to_srgb_pallas
    from j40_tpu.ops.reconstruct import xyb_to_srgb_u8

    monkeypatch.setenv("J40T_PALLAS", "interp")
    rng = np.random.default_rng(0)
    opsin_inv = np.array(
        [[11.03, -9.87, -0.16], [-3.25, 4.42, -0.17], [-3.66, 2.71, 1.95]],
        np.float32)
    c22 = np.concatenate(
        [np.zeros(8), opsin_inv.ravel(), [0.0038] * 3, [1.0, 255.0]]
    ).astype(np.float32)
    plane = (rng.normal(size=(3, 64, 2048)) * 0.3).astype(np.float32)
    out = np.asarray(xyb_to_srgb_pallas(jnp.asarray(plane), jnp.asarray(c22)))
    ref = np.asarray(xyb_to_srgb_u8(
        jnp.asarray(plane), jnp.asarray(opsin_inv), jnp.asarray(c22[17:20]),
        jnp.float32(1.0), jnp.float32(255.0)))
    assert np.abs(np.clip(out, 0, 255) - np.clip(ref, 0, 255)).max() <= 1


def test_mixed_kitchen_sink_vs_dj40(dj40, tmp_path):
    """Config-4 depth: mixed varblocks + 3 HF presets + custom dequant
    matrices + permuted orders + ANS coding, all in one stream."""
    from j40_tpu.encode.vardct_enc import VarDCTOptions

    rng = np.random.default_rng(21)
    img = (np.cumsum(rng.integers(-2, 3, size=(520, 600, 3)), axis=1)
           % 200 + 20).astype(np.uint8)
    img[:128, :256] = img[4, 4]
    cs = encode_vardct_mixed(img, options=VarDCTOptions(
        num_hf_presets=3, custom_dq=True, custom_order=True,
        use_prefix=False))
    ref = _dj40(dj40, cs, tmp_path)
    _, ours = decode_file(cs)
    assert np.abs(ours[:, :, :3].astype(int) - ref).max() <= 1


def test_mixed_four_classes_custom_dq_vs_dj40(dj40, tmp_path):
    """All four merge classes (DCT32X32/16X16/8X16/16X8) + 8x8 in one
    stream with custom (RAW for non-8x8) dequant matrices and permuted
    orders.  Regression: the encoder must quantize with the weights the
    stream signals — quantizing with library weights while signaling
    custom ones drove accidental noisy merges into the sRGB saturation
    region, where our clipping and dj40's diverge (j40.h:7053-7097
    dequant; j40.h:7208-7241 XYB->sRGB)."""
    from j40_tpu.encode.vardct_enc import VarDCTOptions

    rng = np.random.default_rng(777)
    img = (np.cumsum(rng.integers(-3, 4, size=(512, 1024, 3)), axis=1)
           % 256).astype(np.uint8)
    flat = img[10, 10]
    img[:256, :256] = flat            # 32x32-cell flat  -> DCT32X32
    img[288:304, 256:512] = flat      # 2-cell band      -> DCT16X16
    img[312:320, 512:768] = flat      # 1-cell band      -> DCT8X16
    for x8 in range(96, 128, 2):      # broken 2x1 cols  -> DCT16X8
        img[336:352, x8 * 8 : x8 * 8 + 8] = flat
    stats: dict = {}
    cs = encode_vardct_mixed(
        img,
        options=VarDCTOptions(custom_order=True, custom_dq=True),
        stats_out=stats,
    )
    assert set(stats["dctsel_counts"]) >= {0, 4, 5, 6, 7}, stats
    ref = _dj40(dj40, cs, tmp_path)
    _, ours = decode_file(cs)
    assert np.abs(ours[:, :, :3].astype(int) - ref).max() <= 1


def test_native_placement_matches_python_oracle():
    """j40t_place_varblocks A/B vs the Python greedy loop in _hf_metadata
    (j40.h:6636-6687): same blocks map, coeff offsets, and used-bitsets on
    an adversarial random layout of every merge-class shape."""
    from j40_tpu.native.bindings import get_lib, place_varblocks
    from j40_tpu.vardct.state import DCT_SELECT_BLOB

    if get_lib() is None:
        pytest.skip("native core unavailable")

    rng = np.random.default_rng(7)
    ggh8 = ggw8 = 64  # two 256px groups per axis (log_gsize8 = 5)
    log_gsize8 = 5
    # build a valid greedy layout the same way the encoder's chooser would
    covered = np.zeros((ggh8, ggw8), bool)
    dctsels = []
    for y in range(ggh8):
        for x in range(ggw8):
            if covered[y, x]:
                continue
            ok = []
            for sel in (0, 4, 5, 6, 7, 9, 10):  # 8x8..32x32, 16x8/8x16 etc
                lh, lw = DCT_SELECT[sel][0], DCT_SELECT[sel][1]
                vh8, vw8 = 1 << (lh - 3), 1 << (lw - 3)
                x1, y1 = x + vw8 - 1, y + vh8 - 1
                if x1 >= ggw8 or y1 >= ggh8:
                    continue
                if (x >> log_gsize8) != (x1 >> log_gsize8):
                    continue
                if (y >> log_gsize8) != (y1 >> log_gsize8):
                    continue
                if covered[y : y + vh8, x : x + vw8].any():
                    continue
                ok.append(sel)
            sel = int(rng.choice(ok))
            lh, lw = DCT_SELECT[sel][0], DCT_SELECT[sel][1]
            covered[y : y + (1 << (lh - 3)), x : x + (1 << (lw - 3))] = True
            dctsels.append(sel)
    dctsels = np.asarray(dctsels, np.int32)

    blocks, coeffoff, vb_x8, vb_y8, used_dct, used_order = place_varblocks(
        dctsels, ggw8, ggh8, log_gsize8, DCT_SELECT_BLOB
    )

    # Python oracle (the loop _hf_metadata falls back to with native off)
    pblocks = np.zeros((ggh8, ggw8), np.int32)
    pcoeff = np.zeros(len(dctsels), np.int64)
    pused_dct = pused_order = 0
    voff = off = 0
    for y0 in range(ggh8):
        for x0 in range(ggw8):
            if pblocks[y0, x0]:
                continue
            sel = int(dctsels[voff])
            lh, lw, _, order_idx = DCT_SELECT[sel]
            pused_dct |= 1 << sel
            pused_order |= 1 << order_idx
            pcoeff[voff] = off
            vh8, vw8 = 1 << (lh - 3), 1 << (lw - 3)
            assert vb_x8[voff] == x0 and vb_y8[voff] == y0
            pblocks[y0 : y0 + vh8, x0 : x0 + vw8] = (1 << 20) | voff
            pblocks[y0, x0] = (sel + 2) << 20 | voff
            off += 1 << (lh + lw)
            voff += 1
    assert voff == len(dctsels)
    np.testing.assert_array_equal(blocks, pblocks)
    np.testing.assert_array_equal(coeffoff, pcoeff)
    assert (used_dct, used_order) == (pused_dct, pused_order)


def test_native_placement_error_codes():
    """Placement rejects exactly what the Python loop rejects: too few
    varblocks ("vblk"), bad DctSelect ("dct?"), group-boundary crossings."""
    from j40_tpu.errors import J40Error
    from j40_tpu.native.bindings import get_lib, place_varblocks
    from j40_tpu.vardct.state import DCT_SELECT_BLOB

    if get_lib() is None:
        pytest.skip("native core unavailable")

    # too few varblocks for the area
    with pytest.raises(J40Error, match="vblk"):
        place_varblocks(np.zeros(3, np.int32), 2, 2, 5, DCT_SELECT_BLOB)
    # invalid DctSelect index
    with pytest.raises(J40Error, match="dct"):
        place_varblocks(np.asarray([27], np.int32), 1, 1, 5, DCT_SELECT_BLOB)
    # a 16x16 block (sel 4) whose rect would cross the 256px group boundary:
    # place 31 DCT8x8 first so the 16x16 lands at x8=31 (cells 31,32 span
    # the group edge at log_gsize8=5)
    sels = np.asarray([0] * 31 + [4], np.int32)
    with pytest.raises(J40Error, match="vblk"):
        place_varblocks(sels, 64, 2, 5, DCT_SELECT_BLOB)
    # an int64 DctSelect outside int32 range must raise "dct?" instead of
    # wrapping into the valid 0..26 range through the int32 marshalling cast
    with pytest.raises(J40Error, match="dct"):
        place_varblocks(np.asarray([(1 << 32) + 5], np.int64), 1, 1, 5,
                        DCT_SELECT_BLOB)
