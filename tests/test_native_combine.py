"""Native multithreaded VarDCT reconstruct vs the numpy oracle.

The native reconstruct (native/reconstruct.cpp, wrapped by
vardct/native_combine.py) is the host execution plan's hot path; every
stream decoded with backend='numpy' exercises it when the library is
present.  These tests pin it directly against the pure-Python oracle
(J40T_NATIVE=0) across block classes, thread counts, and output dtypes.
"""

from __future__ import annotations

import numpy as np
import pytest

from j40_tpu.decode import Decoder
from j40_tpu.vardct.native_combine import native_combine_available


def _decode(cs, monkeypatch, native: bool, workers: int = 1):
    monkeypatch.setenv("J40T_NATIVE", "1" if native else "0")
    d = Decoder(cs, backend="numpy", workers=workers)
    d.decode_frame()
    return d.render_rgba8()


@pytest.fixture(scope="module")
def photo():
    rng = np.random.default_rng(97)
    img = np.cumsum(np.cumsum(rng.integers(-2, 3, size=(333, 520, 3)), 0), 1)
    img = (img % 200 + 20).astype(np.uint8)
    img[:64, :128] = img[5, 5]  # flat region -> large varblocks when mixed
    return img


@pytest.mark.skipif(not native_combine_available(), reason="no native lib")
@pytest.mark.parametrize("workers", [1, 4])
def test_native_combine_matches_oracle_mixed(photo, monkeypatch, workers):
    from j40_tpu.encode.vardct_enc import encode_vardct_mixed

    stats: dict = {}
    cs = encode_vardct_mixed(photo, stats_out=stats)
    assert len(stats["dctsel_counts"]) > 1  # really mixed
    ref = _decode(cs, monkeypatch, native=False)
    out = _decode(cs, monkeypatch, native=True, workers=workers)
    assert out.dtype == ref.dtype
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


@pytest.mark.skipif(not native_combine_available(), reason="no native lib")
def test_native_combine_matches_oracle_all8x8(photo, monkeypatch):
    from j40_tpu.encode.vardct_enc import encode_vardct

    cs = encode_vardct(photo)
    ref = _decode(cs, monkeypatch, native=False)
    out = _decode(cs, monkeypatch, native=True, workers=3)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


@pytest.mark.skipif(not native_combine_available(), reason="no native lib")
def test_native_pipelined_multi_lf_group(monkeypatch):
    # >1 LF group with workers>1: reconstructions run on the section worker
    # threads (dispatch_group_native) — must be race-free and bit-stable
    from j40_tpu.encode.vardct_enc import encode_vardct

    rng = np.random.default_rng(99)
    img = (
        np.cumsum(rng.integers(-2, 3, size=(160, 2560, 3)), axis=1) % 180 + 30
    ).astype(np.uint8)
    cs = encode_vardct(img)
    ref = _decode(cs, monkeypatch, native=True, workers=1)
    for _ in range(5):
        out = _decode(cs, monkeypatch, native=True, workers=4)
        assert np.array_equal(out, ref)


@pytest.mark.skipif(not native_combine_available(), reason="no native lib")
@pytest.mark.parametrize("mixed", [False, True])
def test_native_filtered_matches_oracle(photo, monkeypatch, mixed):
    # apply_filters=True on the host plan: native samples -> numpy
    # gaborish/EPF -> native XYB must match the pure-oracle filtered decode
    from j40_tpu.encode.vardct_enc import (
        VarDCTOptions,
        encode_vardct,
        encode_vardct_mixed,
    )

    cs = (encode_vardct_mixed(photo) if mixed
          else encode_vardct(photo, VarDCTOptions(sharpness=7)))
    monkeypatch.setenv("J40T_NATIVE", "0")
    d0 = Decoder(cs, backend="numpy", apply_filters=True)
    d0.decode_frame()
    ref = d0.render_rgba8()
    monkeypatch.setenv("J40T_NATIVE", "1")
    d1 = Decoder(cs, backend="auto", apply_filters=True, workers=4)
    d1.decode_frame()
    out = d1.render_rgba8()
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


@pytest.mark.skipif(not native_combine_available(), reason="no native lib")
def test_native_filtered_3step_epf(photo, monkeypatch):
    # custom restoration with epf_iters=3: exercises the 12-tap KERNELS12
    # pass of the native EPF (plus custom gaborish weights and sigma params)
    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct

    cs = encode_vardct(
        photo, VarDCTOptions(sharpness=5, custom_restoration=True,
                             epf_iters=3)
    )
    ref = None
    monkeypatch.setenv("J40T_NATIVE", "0")
    d0 = Decoder(cs, backend="numpy", apply_filters=True)
    d0.decode_frame()
    ref = d0.render_rgba8()
    monkeypatch.setenv("J40T_NATIVE", "1")
    d1 = Decoder(cs, backend="auto", apply_filters=True, workers=4)
    d1.decode_frame()
    out = d1.render_rgba8()
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


@pytest.mark.skipif(not native_combine_available(), reason="no native lib")
def test_native_combine_int32_dst(photo, monkeypatch):
    # with the u8 fast path disabled the kernel writes int32 planes with the
    # oracle's int16 clip (the non-last-frame / blending layout)
    import j40_tpu.vardct.state as vstate
    from j40_tpu.encode.vardct_enc import encode_vardct

    cs = encode_vardct(photo)
    ref = _decode(cs, monkeypatch, native=False)
    monkeypatch.setattr(vstate, "_use_u8_planes", lambda im, f: False)
    monkeypatch.setenv("J40T_NATIVE", "1")
    d = Decoder(cs, backend="numpy", workers=2)
    fr = d.decode_frame()
    assert fr.gmodular.channels[0].data.dtype == np.int32
    out = d.render_rgba8()
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_native_pack_i4_chunk_vs_numpy():
    # chunk assembly's nibble pack + exception extraction: one native pass
    # must match the numpy clip/view/pair/flatnonzero oracle exactly
    # (slab values are the i8 gather output, always within [-127, 127])
    from j40_tpu.native.bindings import pack_i4_chunk

    rng = np.random.default_rng(5)
    slab = rng.integers(-127, 128, (3, 512, 64)).astype(np.int8)
    mask = rng.random(slab.shape) < 0.95
    slab = np.where(mask, rng.integers(-7, 8, slab.shape), slab).astype(np.int8)

    out = pack_i4_chunk(slab)
    if out is None:
        import pytest
        pytest.skip("native library unavailable")
    cup, f, vals = out
    u = (np.clip(slab, -8, 7).astype(np.int8) + 8).view(np.uint8)
    np.testing.assert_array_equal(cup, u[..., 0::2] | (u[..., 1::2] << 4))
    flat8 = slab.reshape(-1)
    ref_f = np.flatnonzero(np.abs(flat8) > 7).astype(np.int32)
    np.testing.assert_array_equal(f, ref_f)
    np.testing.assert_array_equal(vals, flat8[ref_f].astype(np.int32))
