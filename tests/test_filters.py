"""Restoration filter tests (reference j40.h:7251-7624 — implemented there
but never invoked; we wire them behind Decoder(apply_filters=True))."""

import numpy as np

from j40_tpu.decode import Decoder
from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct
from j40_tpu.ops.filters import KERNELS4, epf_step, gaborish, gaborish_jax

GAB_W = [[0.115169525, 0.061248592]] * 3


def test_gaborish_preserves_constants():
    const = np.full((3, 16, 16), 0.5, dtype=np.float32)
    out = gaborish(const, GAB_W)
    np.testing.assert_allclose(out, const, atol=1e-6)


def test_gaborish_is_smoothing():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, 32, 32)).astype(np.float32)
    out = gaborish(img, GAB_W)
    assert out.var() < img.var()
    # energy roughly preserved on average
    np.testing.assert_allclose(out.mean(), img.mean(), atol=1e-3)


def test_gaborish_jax_parity():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(3, 24, 40)).astype(np.float32)
    a = gaborish(img, GAB_W)
    b = np.asarray(gaborish_jax(img, GAB_W))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_epf_skip_is_identity():
    rng = np.random.default_rng(2)
    img = rng.normal(size=(3, 16, 16)).astype(np.float32)
    rs = np.full((2, 2), -1.0, np.float32)
    out = epf_step(img, 1.0, rs, KERNELS4, True, [40.0, 5.0, 3.5], 2 / 3)
    np.testing.assert_array_equal(out, img)


def test_epf_smooths_with_active_sigma():
    rng = np.random.default_rng(3)
    img = rng.normal(size=(3, 16, 16)).astype(np.float32) * 0.05
    rs = np.full((2, 2), 1.0, np.float32)  # sigma 1.0 >= threshold
    out = epf_step(img, 1.0, rs, KERNELS4, True, [40.0, 5.0, 3.5], 2 / 3)
    assert not np.array_equal(out, img)
    assert out.var() < img.var()


def test_decode_with_filters_end_to_end():
    rng = np.random.default_rng(77)
    img = (
        np.cumsum(np.cumsum(rng.integers(-2, 3, size=(64, 80, 3)), axis=0), axis=1)
        % 200
        + 20
    ).astype(np.uint8)
    cs = encode_vardct(img, VarDCTOptions(sharpness=7))
    d0 = Decoder(cs)
    d0.decode_frame()
    base = d0.render_rgba8()
    d1 = Decoder(cs, apply_filters=True)
    d1.decode_frame()
    filt = d1.render_rgba8()
    assert not np.array_equal(base, filt)
    assert np.isfinite(filt).all()
    # numpy and jax backends agree with filters on
    d2 = Decoder(cs, apply_filters=True, backend="jax")
    d2.decode_frame()
    filt_jax = d2.render_rgba8()
    assert np.abs(filt.astype(int) - filt_jax.astype(int)).max() <= 1


def test_epf_step_jax_parity():
    from j40_tpu.ops.filters import KERNELS12, _epf_step_jax

    rng = np.random.default_rng(5)
    img = rng.normal(size=(3, 24, 40)).astype(np.float32) * 0.1
    rs = rng.uniform(0.5, 2.5, size=(3, 5)).astype(np.float32)
    rs[1, 2] = -1.0  # one skipped block
    for kernels, cross in ((KERNELS4, True), (KERNELS12, True), (KERNELS4, False)):
        ref = epf_step(img, 0.9, rs, kernels, cross, [40.0, 5.0, 3.5], 2 / 3)
        rs_px = np.repeat(np.repeat(rs, 8, 0), 8, 1)[:24, :40]
        out = np.asarray(
            _epf_step_jax(img, rs_px, 0.9, kernels, cross, (40.0, 5.0, 3.5), 2 / 3)
        )
        np.testing.assert_allclose(out, ref, atol=2e-4)


def test_epf_jax_full_parity():
    from types import SimpleNamespace

    from j40_tpu.ops.filters import epf, epf_jax

    rng = np.random.default_rng(6)
    img = rng.normal(size=(3, 32, 32)).astype(np.float32) * 0.1
    f = SimpleNamespace(
        epf_iters=3, epf_channel_scale=[40.0, 5.0, 3.5], epf_quant_mul=0.46,
        epf_pass0_sigma_scale=0.9, epf_pass2_sigma_scale=6.5,
        epf_border_sad_mul=2 / 3, epf_sigma_for_modular=1.0,
        epf_sharp_lut=[i / 7.0 for i in range(8)],
    )
    vs = SimpleNamespace(fs=SimpleNamespace(f=f))
    ref = epf(img, vs, None, is_modular=True)
    out = np.asarray(epf_jax(img, vs, None, is_modular=True))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_epf_pallas_parity():
    """Pallas stripe EPF (interpreter mode off-TPU) vs the numpy oracle."""
    from j40_tpu.ops.filters import KERNELS4, KERNELS12, epf_step
    from j40_tpu.ops.pallas_filters import epf_pallas, gaborish_pallas
    from j40_tpu.ops.filters import gaborish

    rng = np.random.default_rng(11)
    H, W = 40, 72  # ragged vs the 24-row stripe and 128-lane tiles
    ch = rng.normal(size=(3, H, W)).astype(np.float32) * 50
    rs8 = np.abs(rng.normal(size=((H + 7) // 8, (W + 7) // 8))).astype(
        np.float32) + 0.5
    rs8[0, 1] = -1.0  # a skipped block must pass through untouched
    rs_px = np.repeat(np.repeat(rs8, 8, 0), 8, 1)[:H, :W]

    ref = ch.copy()
    cs = (40.0, 5.0, 3.5)
    ref = epf_step(ref, 0.9, rs8, KERNELS12, True, cs, 2.78)
    ref = epf_step(ref, 1.0, rs8, KERNELS4, True, cs, 2.78)
    ref = epf_step(ref, 6.5, rs8, KERNELS4, False, cs, 2.78)
    out = np.asarray(epf_pallas(
        ch, rs_px, iters=3, channel_scale=cs, p0_scale=0.9, p2_scale=6.5,
        border_sad_mul=2.78))
    np.testing.assert_allclose(out, ref, atol=2e-3)

    gw = ((0.115, 0.061), (0.1, 0.05), (0.12, 0.06))
    np.testing.assert_allclose(
        np.asarray(gaborish_pallas(ch, gw)), gaborish(ch, gw), atol=1e-3)


def test_epf_pallas_wide_shapes():
    """Width-adaptive stripes: >=4k-wide planes shrink the stripe to fit
    scoped VMEM; ultra-wide planes fall back to the XLA step (found by a
    real-TPU OOM at W=4096 with the fixed 24-row stripe)."""
    from j40_tpu.ops.filters import KERNELS4, KERNELS12, epf_step
    from j40_tpu.ops.pallas_filters import epf_pallas

    rng = np.random.default_rng(2)
    for (H, W) in ((24, 4096), (16, 8192)):
        ch = rng.normal(size=(3, H, W)).astype(np.float32) * 30
        rs8 = (np.abs(rng.normal(size=((H + 7) // 8, (W + 7) // 8)))
               + 0.5).astype(np.float32)
        rs_px = np.repeat(np.repeat(rs8, 8, 0), 8, 1)[:H, :W]
        ref = ch.copy()
        cs = (40.0, 5.0, 3.5)
        ref = epf_step(ref, 0.9, rs8, KERNELS12, True, cs, 2.78)
        ref = epf_step(ref, 1.0, rs8, KERNELS4, True, cs, 2.78)
        ref = epf_step(ref, 6.5, rs8, KERNELS4, False, cs, 2.78)
        out = np.asarray(epf_pallas(
            ch, rs_px, iters=3, channel_scale=cs, p0_scale=0.9,
            p2_scale=6.5, border_sad_mul=2.78))
        np.testing.assert_allclose(out, ref, atol=5e-3)
