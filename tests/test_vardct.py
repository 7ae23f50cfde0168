"""VarDCT end-to-end differential tests vs the dj40 oracle
(reference j40.h:4545-7247; BASELINE configs 3-4 gates)."""

import subprocess

import numpy as np
import pytest
from PIL import Image

from j40_tpu.decode import decode_file
from j40_tpu.encode.vardct_enc import (
    VarDCTOptions,
    encode_vardct,
    synthesize_vardct,
)
from j40_tpu.vardct.tables import DCT_SELECT, NUM_DCT_SELECT


def _dj40(dj40, cs, tmp_path):
    jxl = tmp_path / "t.jxl"
    png = tmp_path / "t.png"
    jxl.write_bytes(cs)
    r = subprocess.run([str(dj40), str(jxl), str(png)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr + r.stdout
    return np.asarray(Image.open(png).convert("RGBA"))


@pytest.fixture(scope="module")
def photo():
    rng = np.random.default_rng(77)
    return (
        np.cumsum(np.cumsum(rng.integers(-2, 3, size=(64, 80, 3)), axis=0), axis=1)
        % 200
        + 20
    ).astype(np.uint8)


@pytest.mark.parametrize("use_prefix", [True, False])
def test_vardct_encode_decode_psnr(dj40, tmp_path, photo, use_prefix):
    cs = encode_vardct(photo, VarDCTOptions(use_prefix=use_prefix))
    _, rgba = decode_file(cs)
    ref = _dj40(dj40, cs, tmp_path)
    # our float path may differ from the scalar reference by 1 gray level
    assert np.abs(ref.astype(int) - rgba.astype(int)).max() <= 1
    err = rgba[:, :, :3].astype(float) - photo
    psnr = 10 * np.log10(255**2 / np.mean(err**2))
    derr = ref[:, :, :3].astype(float) - photo
    dpsnr = 10 * np.log10(255**2 / np.mean(derr**2))
    assert psnr >= dpsnr - 0.05, (psnr, dpsnr)  # PSNR >= j40 gate
    assert psnr > 28


def _synth(dctsel, rng, reps=2):
    log_vh, log_vw, _, _ = DCT_SELECT[dctsel]
    vh, vw = 1 << log_vh, 1 << log_vw
    if max(vh, vw) > 128:
        reps = 1
    H, W = vh * reps, vw * reps
    h8, w8 = H // 8, W // 8
    grid = np.full((h8, w8), dctsel, dtype=np.int32)
    lf_int = rng.integers(-40, 40, size=(3, h8, w8))
    hf = []
    for _ in range(reps * reps):
        q = rng.integers(-3, 4, size=(3, vh * vw))
        q[rng.random((3, vh * vw)) < 0.85] = 0
        hf.append(q)
    return synthesize_vardct(W, H, grid, lf_int, hf), (H, W)


@pytest.mark.parametrize("dctsel", list(range(NUM_DCT_SELECT)))
def test_all_dct_selects_vs_dj40(dj40, tmp_path, dctsel):
    rng = np.random.default_rng(1000 + dctsel)
    cs, _ = _synth(dctsel, rng)
    _, rgba = decode_file(cs)
    ref = _dj40(dj40, cs, tmp_path)
    assert np.abs(ref.astype(int) - rgba.astype(int)).max() <= 1


def test_mixed_varblock_layout(dj40, tmp_path):
    # 32x64 image: one DCT32x32, four DCT8x16, two DCT16x8 + filler 8x8s
    rng = np.random.default_rng(42)
    h8, w8 = 4, 8
    grid = np.zeros((h8, w8), dtype=np.int32)
    grid[0, 0] = 5  # DCT32x32 covers (0..3, 0..3)
    grid[0, 4] = 7  # DCT8x16 at (0, 4..5)
    grid[0, 6] = 6  # DCT16x8 at (0..1, 6)
    grid[0, 7] = 0
    grid[1, 4] = 2  # DCT2x2
    grid[1, 5] = 14  # AFV0
    grid[1, 7] = 1  # Hornuss
    grid[2, 4] = 4  # DCT16x16 covers (2..3, 4..5)
    grid[2, 6] = 3  # DCT4x4
    grid[2, 7] = 12  # DCT4x8
    grid[3, 6] = 13  # DCT8x4
    grid[3, 7] = 17  # AFV3
    # enumerate varblocks in raster order to size hf arrays
    covered = np.zeros((h8, w8), dtype=bool)
    hf = []
    for y0 in range(h8):
        for x0 in range(w8):
            if covered[y0, x0]:
                continue
            ds = int(grid[y0, x0])
            lvh, lvw, _, _ = DCT_SELECT[ds]
            covered[y0 : y0 + (1 << (lvh - 3)), x0 : x0 + (1 << (lvw - 3))] = True
            size = 1 << (lvh + lvw)
            q = rng.integers(-3, 4, size=(3, size))
            q[rng.random((3, size)) < 0.8] = 0
            hf.append(q)
    lf_int = rng.integers(-40, 40, size=(3, h8, w8))
    cs = synthesize_vardct(w8 * 8, h8 * 8, grid, lf_int, hf)
    _, rgba = decode_file(cs)
    ref = _dj40(dj40, cs, tmp_path)
    assert np.abs(ref.astype(int) - rgba.astype(int)).max() <= 1


def test_non_multiple_of_8_dims(dj40, tmp_path, photo):
    img = photo[:61, :77]
    cs = encode_vardct(img)
    _, rgba = decode_file(cs)
    ref = _dj40(dj40, cs, tmp_path)
    assert np.abs(ref.astype(int) - rgba.astype(int)).max() <= 1
    assert rgba.shape == (61, 77, 4)


def test_jax_backend_parity(photo):
    # device path (dequant+CfL+IDCT+XYB on JAX) vs numpy oracle
    cs = encode_vardct(photo)
    _, a = decode_file(cs, backend="numpy")
    _, b = decode_file(cs, backend="jax")
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_jax_backend_parity_mixed_classes(dj40, tmp_path):
    rng = np.random.default_rng(9)
    cs, _ = _synth(4, rng)  # DCT16x16 (scatter path)
    _, a = decode_file(cs, backend="numpy")
    _, b = decode_file(cs, backend="jax")
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_multi_group_vardct(dj40, tmp_path):
    rng = np.random.default_rng(21)
    img = (
        np.cumsum(np.cumsum(rng.integers(-2, 3, size=(300, 520, 3)), axis=0), axis=1)
        % 200
        + 20
    ).astype(np.uint8)
    cs = encode_vardct(img)
    _, rgba = decode_file(cs)
    ref = _dj40(dj40, cs, tmp_path)
    assert np.abs(ref.astype(int) - rgba.astype(int)).max() <= 1


def test_custom_coefficient_order(dj40, tmp_path, photo):
    # Lehmer-permuted coefficient order (used_orders != 0 path)
    cs = encode_vardct(photo, VarDCTOptions(custom_order=True))
    _, rgba = decode_file(cs)
    ref = _dj40(dj40, cs, tmp_path)
    assert np.abs(ref.astype(int) - rgba.astype(int)).max() <= 1


@pytest.mark.parametrize("num_passes", [2, 3])
def test_progressive_passes(dj40, tmp_path, photo, num_passes):
    # additive multi-pass coefficient streams (j40.h:6989 accumulate)
    cs = encode_vardct(photo, VarDCTOptions(num_passes=num_passes))
    _, rgba = decode_file(cs)
    ref = _dj40(dj40, cs, tmp_path)
    assert np.abs(ref.astype(int) - rgba.astype(int)).max() <= 1


def test_custom_dq_matrices(dj40, tmp_path, photo):
    # all custom dequant-matrix encodings: parametric modes for 8x8 sets,
    # RAW (modular-coded) for the rest (j40.h:4696-4777)
    cs = encode_vardct(photo, VarDCTOptions(custom_dq=True, hf_mul=64))
    _, rgba = decode_file(cs)
    ref = _dj40(dj40, cs, tmp_path)
    assert np.abs(ref.astype(int) - rgba.astype(int)).max() <= 1


def test_custom_dq_special_transforms(dj40, tmp_path):
    # custom Hornuss/DCT2/DCT4/DCT4X8/AFV tables actually used by blocks
    rng = np.random.default_rng(60)
    h8 = w8 = 4
    grid = np.zeros((h8, w8), np.int32)
    for i, ds in enumerate([1, 2, 3, 12, 14, 15, 16, 17]):
        grid[i // 4, i % 4] = ds
    hf = []
    for _ in range(h8 * w8):
        q = rng.integers(-3, 4, size=(3, 64))
        q[rng.random((3, 64)) < 0.8] = 0
        hf.append(q)
    lf = rng.integers(-40, 40, size=(3, h8, w8))
    cs = synthesize_vardct(32, 32, grid, lf, hf,
                           options=VarDCTOptions(custom_dq=True))
    _, rgba = decode_file(cs)
    ref = _dj40(dj40, cs, tmp_path)
    assert np.abs(ref.astype(int) - rgba.astype(int)).max() <= 1


def test_nonzero_cfl_factors(dj40, tmp_path):
    # per-64px-cell chroma-from-luma factors (xfromy/bfromy planes)
    rng = np.random.default_rng(50)
    h8 = w8 = 16
    grid = np.zeros((h8, w8), np.int32)
    lf = rng.integers(-40, 40, size=(3, h8, w8))
    hf = []
    for _ in range(h8 * w8):
        q = rng.integers(-3, 4, size=(3, 64))
        q[rng.random((3, 64)) < 0.8] = 0
        hf.append(q)
    xf = rng.integers(-60, 60, size=(2, 2))
    bf = rng.integers(-60, 60, size=(2, 2))
    cs = synthesize_vardct(128, 128, grid, lf, hf, xfromy=xf, bfromy=bf)
    _, rgba = decode_file(cs)
    ref = _dj40(dj40, cs, tmp_path)
    assert np.abs(ref.astype(int) - rgba.astype(int)).max() <= 1
    # device path parity
    _, rj = decode_file(cs, backend="jax")
    assert np.abs(rj.astype(int) - rgba.astype(int)).max() <= 1


@pytest.mark.slow
def test_multi_lf_group(dj40, tmp_path):
    # image wider than 2048: two LF groups side by side
    rng = np.random.default_rng(4)
    img = (
        np.cumsum(np.cumsum(rng.integers(-1, 2, size=(160, 2304, 3)), axis=0), axis=1)
        % 200
        + 20
    ).astype(np.uint8)
    cs = encode_vardct(img)
    _, rgba = decode_file(cs)
    ref = _dj40(dj40, cs, tmp_path)
    assert np.abs(ref.astype(int) - rgba.astype(int)).max() <= 1


def test_vardct_with_alpha(dj40, tmp_path):
    # alpha rides as a losslessly-coded extra channel; the reference DROPS
    # extra channels during combine (j40.h:7869-7874) so dj40 must agree on
    # color and render opaque alpha, while we preserve it
    rng = np.random.default_rng(12)
    img = (
        np.cumsum(np.cumsum(rng.integers(-2, 3, size=(48, 56, 4)), axis=0), axis=1)
        % 200
        + 20
    ).astype(np.uint8)
    cs = encode_vardct(img)
    _, rgba = decode_file(cs)
    np.testing.assert_array_equal(rgba[:, :, 3], img[:, :, 3])
    ref = _dj40(dj40, cs, tmp_path)
    assert np.abs(ref[:, :, :3].astype(int) - rgba[:, :, :3].astype(int)).max() <= 1
    assert (ref[:, :, 3] == 255).all()  # the reference's documented behavior


def test_hf_presets(dj40, tmp_path):
    # num_hf_presets > 1: per-group preset selectors offset the coefficient
    # contexts (j40.h:7020)
    rng = np.random.default_rng(3)
    img = (
        np.cumsum(np.cumsum(rng.integers(-2, 3, size=(300, 520, 3)), axis=0), axis=1)
        % 200
        + 20
    ).astype(np.uint8)
    cs = encode_vardct(img, VarDCTOptions(num_hf_presets=3))
    _, rgba = decode_file(cs)
    ref = _dj40(dj40, cs, tmp_path)
    assert np.abs(ref.astype(int) - rgba.astype(int)).max() <= 1


def test_custom_block_contexts(dj40, tmp_path):
    # custom lf/qf thresholds + clustered block-context map (j40.h:6287-6305),
    # with per-varblock HfMul so qfidx actually varies
    rng = np.random.default_rng(70)
    h8 = w8 = 8
    grid = np.zeros((h8, w8), np.int32)
    lf = rng.integers(-40, 40, size=(3, h8, w8))
    hf = []
    for _ in range(h8 * w8):
        q = rng.integers(-3, 4, size=(3, 64))
        q[rng.random((3, 64)) < 0.8] = 0
        hf.append(q)
    hfmul = rng.integers(4, 40, size=h8 * w8)
    lf_thr = [[0], [5, 20], [-10]]
    qf_thr = [8, 24]
    size = 39
    for n in (1, 2, 1):
        size *= n + 1
    size *= 2 + 1
    cmap = [i % 8 for i in range(size)]
    opt = VarDCTOptions(block_ctx=dict(lf_thr=lf_thr, qf_thr=qf_thr, map=cmap))
    cs = synthesize_vardct(64, 64, grid, lf, hf, options=opt, hfmul_per_vb=hfmul)
    _, rgba = decode_file(cs)
    ref = _dj40(dj40, cs, tmp_path)
    assert np.abs(ref.astype(int) - rgba.astype(int)).max() <= 1


def test_quality_knob_monotonic_psnr():
    # larger HfMul = finer quantization = higher PSNR
    import numpy as np

    from j40_tpu.decode import decode_file
    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct

    rng = np.random.default_rng(60)
    img = (np.cumsum(np.cumsum(rng.integers(-2, 3, (64, 64, 3)), 0), 1) % 200
           + 20).astype(np.uint8)

    def psnr(hf_mul):
        data = encode_vardct(img, VarDCTOptions(hf_mul=hf_mul))
        _, rgba = decode_file(data)
        mse = np.mean((rgba[:, :, :3].astype(float) - img) ** 2)
        return 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))

    p32, p8, p2 = psnr(32), psnr(8), psnr(2)
    assert p32 >= p8 - 0.1 >= p2 - 0.2
    assert p8 > 30  # default quality is visually good


def test_vardct_ans_coding_vs_dj40(dj40, tmp_path):
    # ANS (rANS alias) coding for the VarDCT coefficient streams — the
    # modular suite covers ANS elsewhere; this covers the 495-context
    # coefficient spec with ANS distributions
    import subprocess

    import numpy as np
    from PIL import Image as PILImage

    from j40_tpu.decode import decode_file
    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct

    rng = np.random.default_rng(61)
    img = (np.cumsum(np.cumsum(rng.integers(-2, 3, (48, 56, 3)), 0), 1) % 200
           + 20).astype(np.uint8)
    data = encode_vardct(img, VarDCTOptions(use_prefix=False))
    jxl = tmp_path / "a.jxl"
    jxl.write_bytes(data)
    png = tmp_path / "a.png"
    r = subprocess.run([str(dj40), str(jxl), str(png)], capture_output=True, text=True)
    assert r.returncode == 0, f"dj40 failed: {r.stderr}"
    ref = np.asarray(PILImage.open(png).convert("RGB"))
    _, rgba = decode_file(data)
    assert np.abs(rgba[:, :, :3].astype(int) - ref.astype(int)).max() <= 1


def test_progressive_partial_decode():
    # decoding only pass 1 of a 2-pass stream == decoding the coarse
    # coefficients alone (the TOC's per-pass sections are skippable)
    import numpy as np

    from j40_tpu.decode import Decoder
    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct

    rng = np.random.default_rng(62)
    img = (np.cumsum(np.cumsum(rng.integers(-2, 3, (64, 72, 3)), 0), 1) % 200
           + 20).astype(np.uint8)
    data = encode_vardct(img, VarDCTOptions(num_passes=2))

    full = Decoder(data)
    full.decode_frame()
    rgba_full = full.render_rgba8()

    part = Decoder(data, max_passes=1)
    part.decode_frame()
    rgba_part = part.render_rgba8()

    # partial decode is a valid coarser image: differs from the full decode
    # but is close to it (pass 2 carries only |q|<=1 refinements)
    assert not np.array_equal(rgba_part, rgba_full)
    diff = np.abs(rgba_part[:, :, :3].astype(float) - rgba_full[:, :, :3])
    assert diff.mean() < 8.0
    mse = np.mean((rgba_part[:, :, :3].astype(float) - img) ** 2)
    assert 10 * np.log10(255.0 ** 2 / mse) > 25  # still a good preview


def test_vardct_alpha_multigroup_vs_dj40(dj40, tmp_path):
    # alpha in a multi-group VarDCT frame: extra channels route through the
    # pass-group modular sub-streams (the 256px restriction is lifted)
    import subprocess

    import numpy as np
    from PIL import Image as PILImage

    from j40_tpu.decode import decode_file
    from j40_tpu.encode.vardct_enc import encode_vardct

    rng = np.random.default_rng(63)
    img = (np.cumsum(np.cumsum(rng.integers(-2, 3, (300, 280, 4)), 0), 1) % 200
           + 20).astype(np.uint8)
    data = encode_vardct(img)
    _, rgba = decode_file(data)
    # alpha round-trips losslessly; color within VarDCT tolerance
    np.testing.assert_array_equal(rgba[:, :, 3], img[:, :, 3])
    # dj40 decodes the color (it drops extra channels at render)
    jxl = tmp_path / "a.jxl"
    jxl.write_bytes(data)
    png = tmp_path / "a.png"
    r = subprocess.run([str(dj40), str(jxl), str(png)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ref = np.asarray(PILImage.open(png).convert("RGB"))
    assert np.abs(rgba[:, :, :3].astype(int) - ref.astype(int)).max() <= 1


@pytest.mark.parametrize("bpp", [10, 12])
def test_vardct_high_bitdepth(dj40, tmp_path, bpp):
    # bpp>8 VarDCT: uint16 input, RGBA16 render; dj40 renders the same
    # stream at 8 bits (j40.h:7917-7921 keeps render integer-u8-only),
    # so the differential gate is on our 8-bit render.
    from j40_tpu.decode import Decoder

    rng = np.random.default_rng(5)
    maxval = (1 << bpp) - 1
    base = rng.integers(maxval // 16, maxval - maxval // 16, (8, 12, 3))
    img = np.kron(base.astype(np.float64), np.ones((8, 8, 1)))[:64, :96]
    img = img.astype(np.uint16)
    cs = encode_vardct(img, VarDCTOptions(bpp=bpp))

    dec = Decoder(cs)
    while not dec.done:
        dec.decode_frame()
    ref = _dj40(dj40, cs, tmp_path)
    ours8 = dec.render_rgba8()
    assert np.abs(ref.astype(int) - ours8.astype(int)).max() <= 1

    out16 = dec.render_rgba16()
    assert out16.dtype == np.uint16
    o = out16[:, :, :3].astype(np.float64) * maxval / 65535.0
    psnr = 10 * np.log10(maxval**2 / np.mean((o - img) ** 2))
    assert psnr > 55, psnr  # flat blocks quantize near-losslessly
