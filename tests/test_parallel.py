"""Multi-device / multi-image parallel decode tests (virtual 8-device CPU
mesh; see conftest.py)."""

import numpy as np
import pytest

from j40_tpu.decode import decode_file
from j40_tpu.encode.encoder import encode_modular
from j40_tpu.encode.vardct_enc import encode_vardct
from j40_tpu.parallel.batch import decode_batch


def _images(n):
    rng = np.random.default_rng(31)
    out = []
    for _ in range(n):
        img = (
            np.cumsum(rng.integers(-3, 4, size=(40, 48, 3)), axis=1) % 200 + 20
        ).astype(np.uint8)
        out.append(img)
    return out


def _require_devices(n: int = 8) -> None:
    # under J40_TESTS_TPU=1 the suite runs on the single real chip; the
    # mesh/multi-device tests cover the virtual CPU mesh (conftest default)
    import jax

    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices (single-chip TPU run)")


def test_decode_batch_modular():
    imgs = _images(6)
    blobs = [encode_modular(im) for im in imgs]
    outs = decode_batch(blobs, workers=4, backend="numpy")
    for im, out in zip(imgs, outs):
        np.testing.assert_array_equal(out[:, :, :3], im)


def test_decode_batch_vardct_jax_multidevice():
    _require_devices(2)
    imgs = _images(4)
    blobs = [encode_vardct(im) for im in imgs]
    outs = decode_batch(blobs, workers=4, backend="jax")
    # parity against single-device sequential decode
    for blob, out in zip(blobs, outs):
        _, ref = decode_file(blob, backend="numpy")
        assert np.abs(ref.astype(int) - out.astype(int)).max() <= 1


@pytest.mark.parametrize("nimg,chunk", [(5, 2), (4, 4)])
def test_decode_batch_device_serving(monkeypatch, nimg, chunk):
    """The device serving path (pipelined chunks, packed uploads,
    device-resident RGBA) must match the host decoder ±1 on every image,
    including a padded tail chunk (5 images / chunk 2)."""
    monkeypatch.setenv("J40T_PALLAS", "interp")
    from j40_tpu.parallel.batch import decode_batch_device

    rng = np.random.default_rng(5)
    imgs = []
    for _ in range(nimg):
        img = (
            np.cumsum(rng.integers(-2, 3, size=(64, 64, 3)), axis=1) % 180 + 30
        ).astype(np.uint8)
        imgs.append(img)
    blobs = [encode_vardct(im) for im in imgs]
    st: dict = {}
    out = decode_batch_device(blobs, workers=2, chunk=chunk, fetch=True,
                              stats_out=st)
    assert out.shape == (nimg, 64, 64, 4) and out.dtype == np.uint8
    assert st["images"] == nimg and st["upload_bytes"] > 0
    for blob, got in zip(blobs, out):
        _, ref = decode_file(blob, backend="numpy")
        assert np.abs(ref.astype(int) - got.astype(int)).max() <= 1


def test_pack_i4_roundtrip():
    """4-bit nibble pack/unpack with exceptions is lossless for arbitrary
    integral coefficient planes."""
    from j40_tpu.ops.combine_jax import _pack_i4, pack_coeffs_auto, unpack_i4_jax

    rng = np.random.default_rng(7)
    # mostly-small values with outliers beyond both nibble and int8 range
    arr = rng.integers(-6, 7, (3, 50, 64)).astype(np.float32)
    pos = rng.integers(0, arr.size, 40)
    arr.reshape(-1)[pos] = rng.integers(-300, 300, 40)
    packed, exc_idx, exc_val = _pack_i4(arr)
    assert packed.shape == (3, 50, 32)
    import jax.numpy as jnp

    un = np.asarray(unpack_i4_jax(jnp.asarray(packed), arr.shape))
    flat = un.reshape(-1).astype(np.int64)
    flat[exc_idx] = exc_val[: len(exc_idx)]
    np.testing.assert_array_equal(flat.reshape(arr.shape), arr.astype(np.int64))
    kind, *_ = pack_coeffs_auto(arr)
    assert kind == "i4"  # sparse/low-amplitude plane picks nibbles
    noisy = rng.integers(-120, 120, (3, 50, 64)).astype(np.float32)
    kind2, *_ = pack_coeffs_auto(noisy)
    assert kind2 == "i8"


def test_native_pack_and_chunk_assembly():
    """Native one-pass pack (pack_coeffs_i8) and the chunk assembler must
    reproduce the coefficient plane losslessly for both upload kinds,
    including exceptions beyond the int8 range and a zero-padded tail."""
    from j40_tpu.native.bindings import pack_coeffs_i8
    from j40_tpu.parallel.batch import _assemble_chunk

    rng = np.random.default_rng(11)
    n = 16  # blocks per image

    def unpack(kind, cup, exc_idx, exc_val, shape):
        if kind == "i4":
            lo = (cup & 0xF).astype(np.int32) - 8
            hi = (cup >> 4).astype(np.int32) - 8
            flat = np.stack([lo, hi], axis=-1).reshape(-1)
        else:
            flat = cup.astype(np.int32).reshape(-1)
        flat[exc_idx] = exc_val
        return flat.reshape(shape)

    h8, w8 = 2, 8  # 16 blocks; kx/kb (aux rows 4-5) are per-64px-tile
    for amp, want in ((6, "i4"), (110, "i8")):
        plans, origs = [], []
        for _ in range(3):
            c = rng.integers(-amp, amp + 1, (3, n, 64)).astype(np.float32)
            pos = rng.integers(0, c.size, 7)
            c.reshape(-1)[pos] = rng.integers(-500, 500, 7)
            aux = rng.normal(size=(6, n)).astype(np.float32)
            # rows 4/5 must be tile-constant (CfL factors are, by
            # construction); the assembler keeps only the tile grid
            aux[4] = aux[4, 0]
            aux[5] = aux[5, 0]
            pk = pack_coeffs_i8(c)
            # the native pack must agree with the numpy fallback
            iv = c.reshape(-1).astype(np.int32)
            ref_exc = np.flatnonzero(np.abs(iv) > 127)
            np.testing.assert_array_equal(pk[1], ref_exc)
            np.testing.assert_array_equal(pk[2], iv[ref_exc])
            assert pk[3] == int(np.count_nonzero(np.abs(iv) > 7))
            np.testing.assert_array_equal(
                pk[0].reshape(-1), np.clip(iv, -127, 127).astype(np.int8))
            fill0 = int(iv[0])
            plans.append(((*pk, fill0), aux, None, None))
            origs.append((c, aux))
        kind, cup, exc_idx, exc_val, aux_out, kgrids = _assemble_chunk(
            plans, chunk=4, n=n, h8=h8, w8=w8)  # 3 imgs in a 4-chunk: pad
        assert kind == want
        got = unpack(kind, cup, exc_idx, exc_val, (3, 4 * n, 64))
        for i, (c, aux) in enumerate(origs):
            np.testing.assert_array_equal(
                got[:, i * n : (i + 1) * n], c.astype(np.int32))
            np.testing.assert_array_equal(
                aux_out[:, i * n : (i + 1) * n], aux[:4])
            assert kgrids[i, 0].ravel()[0] == aux[4, 0]
            assert kgrids[i, 1].ravel()[0] == aux[5, 0]


def test_gather_pack_matches_dense_gather():
    """The fused native gather+pack must agree with gather_full_dct8
    followed by the scalar pack on a real decoded stream."""
    from j40_tpu.decode import Decoder
    from j40_tpu.encode.vardct_enc import encode_vardct
    from j40_tpu.native.bindings import pack_coeffs_i8
    from j40_tpu.ops.combine_jax import gather_full_dct8, gather_pack_dct8_i8
    from j40_tpu.parallel.batch import _plan_gate

    rng = np.random.default_rng(13)
    img = (
        np.cumsum(rng.integers(-3, 4, size=(128, 192, 3)), axis=0) % 200 + 20
    ).astype(np.uint8)
    d = Decoder(encode_vardct(img), backend="jax")
    d.decode_frame(_defer_finish=True)
    vs, gg = _plan_gate(d)
    f = d._deferred[0]
    coeffs, aux_ref, w_ref, k_ref = gather_full_dct8(vs, gg, d.image, f)
    i8_ref, eidx_ref, eval_ref, gt7_ref = pack_coeffs_i8(coeffs)
    (i8, eidx, eval_, gt7, fill0), aux, w, k = gather_pack_dct8_i8(
        vs, gg, d.image, f)
    np.testing.assert_array_equal(i8, i8_ref)
    np.testing.assert_array_equal(eidx, eidx_ref)
    np.testing.assert_array_equal(eval_, eval_ref)
    assert gt7 == gt7_ref and fill0 == int(coeffs.reshape(-1)[0])
    np.testing.assert_array_equal(aux, aux_ref)
    np.testing.assert_array_equal(w, w_ref)
    np.testing.assert_array_equal(k, k_ref)


def test_multipass_workers_bit_stable():
    # regression: two passes of one group accumulate (+=) into the same
    # coefficient planes; with a naive section-level thread map they race
    # (lost updates). Per-group chains must make workers>1 bit-stable.
    from j40_tpu.decode import Decoder
    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct

    rng = np.random.default_rng(77)
    img = (
        np.cumsum(rng.integers(-2, 3, size=(600, 520, 3)), axis=0) % 180 + 30
    ).astype(np.uint8)
    blob = encode_vardct(img, VarDCTOptions(num_passes=3))

    dec = Decoder(blob, workers=1)
    dec.decode_frame()
    assert dec.stats["num_passes"] == 3 and dec.stats["num_groups"] > 1
    ref = dec.render_rgba8()
    for _ in range(20):
        d = Decoder(blob, workers=8)
        d.decode_frame()
        np.testing.assert_array_equal(d.render_rgba8(), ref)


def test_parallel_lf_groups_bit_stable():
    # multi-LF-group image: LF sections decode on parallel threads; the
    # shared lazy dq-matrix/order materialization is lock-serialized
    from j40_tpu.decode import Decoder
    from j40_tpu.encode.vardct_enc import encode_vardct

    rng = np.random.default_rng(78)
    img = (
        np.cumsum(rng.integers(-2, 3, size=(96, 2560, 3)), axis=1) % 180 + 30
    ).astype(np.uint8)
    blob = encode_vardct(img)
    dec = Decoder(blob, workers=1)
    dec.decode_frame()
    assert dec.stats["num_lf_groups"] == 2
    ref = dec.render_rgba8()
    for _ in range(6):
        d = Decoder(blob, workers=8)
        d.decode_frame()
        np.testing.assert_array_equal(d.render_rgba8(), ref)


def test_dryrun_multichip():
    _require_devices(8)
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = fn(*args)
    assert out.shape == (3, 64, 64)
    ge.dryrun_multichip(8)


def test_sharded_gaborish_matches_unsharded():
    # whole-image gaborish sharded over 8 devices with ppermute halo exchange
    # must match the single-device reference exactly
    import jax
    from jax.sharding import Mesh

    from j40_tpu.ops.filters import gaborish
    from j40_tpu.ops.sharded_filters import sharded_gaborish

    rng = np.random.default_rng(44)
    img = rng.normal(size=(3, 64, 48)).astype(np.float32)
    weights = [[0.115169525, 0.061248592]] * 3
    ref = gaborish(img, weights)
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("rows",))
    out = np.asarray(sharded_gaborish(img, weights, mesh))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sharded_epf_matches_unsharded():
    # 3-step whole-image EPF with 3-row ppermute halos == single-device EPF
    import jax
    from jax.sharding import Mesh

    from j40_tpu.ops.filters import _epf_steps_jit
    from j40_tpu.ops.sharded_filters import sharded_epf

    rng = np.random.default_rng(45)
    img = (rng.normal(size=(3, 64, 48)) * 0.1).astype(np.float32)
    rs = rng.uniform(0.5, 2.5, size=(8, 6)).astype(np.float32)
    rs[3, 2] = -1.0  # a skipped block
    rs_px = np.repeat(np.repeat(rs, 8, 0), 8, 1)
    ref = np.asarray(_epf_steps_jit()(
        img, rs_px, iters=3, channel_scale=(40.0, 5.0, 3.5),
        p0_scale=0.9, p2_scale=6.5, border_sad_mul=2 / 3,
    ))
    mesh = Mesh(np.array(jax.devices()[:8]), ("rows",))
    out = np.asarray(sharded_epf(img, rs_px, mesh, iters=3))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sharded_epf_pallas_matches_unsharded(monkeypatch):
    # same parity with the per-shard Pallas stripe kernel (interpreter mode
    # off-TPU; on a real TPU mesh this is the default path)
    import jax
    from jax.sharding import Mesh

    from j40_tpu.ops.filters import _epf_steps_jit
    from j40_tpu.ops.sharded_filters import sharded_epf

    monkeypatch.setenv("J40T_PALLAS", "interp")
    rng = np.random.default_rng(46)
    img = (rng.normal(size=(3, 64, 48)) * 0.1).astype(np.float32)
    rs = rng.uniform(0.5, 2.5, size=(8, 6)).astype(np.float32)
    rs[1, 1] = -1.0
    rs_px = np.repeat(np.repeat(rs, 8, 0), 8, 1)
    ref = np.asarray(_epf_steps_jit()(
        img, rs_px, iters=3, channel_scale=(40.0, 5.0, 3.5),
        p0_scale=0.9, p2_scale=6.5, border_sad_mul=2 / 3,
    ))
    mesh = Mesh(np.array(jax.devices()[:8]), ("rows",))
    out = np.asarray(sharded_epf(img, rs_px, mesh, iters=3))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sharded_decode_real_bitstream_multi_lf_group():
    # the full multi-chip path on a REAL bitstream: TOC byte ranges scattered
    # over owner workers, block rows striped over an 8-device mesh, parity
    # against the single-device Decoder (filters off: the single-device path
    # filters per LF group, the sharded path whole-image)
    import jax
    from jax.sharding import Mesh

    from j40_tpu.encode.vardct_enc import encode_vardct
    from j40_tpu.parallel.sharded_decode import decode_sharded

    rng = np.random.default_rng(60)
    img = (
        np.cumsum(rng.integers(-2, 3, size=(128, 2560, 3)), axis=1) % 180 + 30
    ).astype(np.uint8)
    cs = encode_vardct(img)
    _, ref = decode_file(cs)
    mesh = Mesh(np.array(jax.devices()[:8]), ("rows",))
    out = decode_sharded(cs, mesh=mesh, apply_filters=False)
    assert np.abs(out.astype(int) - ref[:, :, :3].astype(int)).max() <= 1


def test_sharded_decode_with_halo_filters_ragged_height():
    # gaborish + 2-step EPF with ppermute halo exchange, ragged height (not a
    # multiple of 8*n): pad rows maintain the half-sample mirror so output
    # matches the single-device filtered decode
    import jax
    from jax.sharding import Mesh

    from j40_tpu.decode import Decoder
    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct
    from j40_tpu.parallel.sharded_decode import decode_sharded

    rng = np.random.default_rng(61)
    img = (
        np.cumsum(np.cumsum(rng.integers(-2, 3, size=(237, 520, 3)), axis=0),
                  axis=1) % 200 + 20
    ).astype(np.uint8)
    cs = encode_vardct(img, VarDCTOptions(sharpness=7))
    d = Decoder(cs, apply_filters=True)
    d.decode_frame()
    ref = d.render_rgba8()
    mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
    out = decode_sharded(cs, mesh=mesh, apply_filters=True)
    assert np.abs(out.astype(int) - ref[:, :, :3].astype(int)).max() <= 1


def test_sharded_decode_batch_2d_mesh():
    # (img, rows) 2-D mesh: 2 images data-parallel x 4-way row-striped
    import jax
    from jax.sharding import Mesh

    from j40_tpu.encode.vardct_enc import encode_vardct
    from j40_tpu.parallel.sharded_decode import decode_sharded_batch

    rng = np.random.default_rng(62)
    imgs = [
        (np.cumsum(rng.integers(-2, 3, size=(96, 320, 3)), axis=1) % 180 + 30)
        .astype(np.uint8)
        for _ in range(2)
    ]
    blobs = [encode_vardct(im) for im in imgs]
    _require_devices(8)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("img", "rows"))
    outs = decode_sharded_batch(blobs, mesh, apply_filters=False)
    for blob, out in zip(blobs, outs):
        _, ref = decode_file(blob)
        assert np.abs(out.astype(int) - ref[:, :, :3].astype(int)).max() <= 1


def test_sharded_decode_mixed_dctselect():
    # mixed-DctSelect streams shard too: non-8x8 classes reconstruct into a
    # full-size overlay that shards as data (varblocks never need a
    # cross-shard scatter); parity vs the single-device decoder
    import jax
    from jax.sharding import Mesh

    from j40_tpu.encode.vardct_enc import encode_vardct_mixed
    from j40_tpu.parallel.sharded_decode import decode_sharded

    _require_devices(8)
    rng = np.random.default_rng(7)
    img = (np.cumsum(rng.integers(-2, 3, size=(320, 512, 3)), axis=1)
           % 200 + 20).astype(np.uint8)
    img[:96, :192] = img[4, 4]
    stats: dict = {}
    cs = encode_vardct_mixed(img, stats_out=stats)
    assert sum(stats["dctsel_counts"].get(s, 0) for s in (4, 5, 6, 7)) > 0
    from j40_tpu.decode import Decoder

    d = Decoder(cs, apply_filters=True)
    d.decode_frame()
    ref = d.render_rgba8()
    mesh = Mesh(np.array(jax.devices()[:8]), ("rows",))
    out = decode_sharded(cs, mesh=mesh, apply_filters=True)
    assert np.abs(out.astype(int) - ref[:, :, :3].astype(int)).max() <= 1


@pytest.mark.parametrize("rct_type", [0, 6])
def test_sharded_lossless_bit_exact(rct_type):
    """Squeeze+RCT inverse transforms as sharded device compute: the
    unsqueeze scan axis alternates, the sharded axis flips with it
    (distributed transpose), and the integer path must be EXACTLY equal
    to the single-device decoder (config-2 analog; the reference stubs
    Squeeze at j40.h:4518)."""
    import jax
    from jax.sharding import Mesh

    from j40_tpu.decode import Decoder
    from j40_tpu.encode.advanced import AdvancedOptions, encode_modular_advanced
    from j40_tpu.parallel.sharded_lossless import decode_sharded_lossless

    devices = np.asarray(jax.devices()[:4], dtype=object)
    if len(devices) < 2:
        pytest.skip("needs a multi-device mesh")
    rng = np.random.default_rng(77)
    img = (np.cumsum(rng.integers(-3, 4, size=(192, 320, 3)), axis=1)
           % 210 + 20).astype(np.uint8)
    opts = AdvancedOptions(squeeze=True)
    if rct_type:
        opts = AdvancedOptions(squeeze=True, rct_type=rct_type)
    blob = encode_modular_advanced(img, options=opts)
    d = Decoder(blob, workers=2)
    d.decode_frame()
    ref = d.render_rgba8()
    out = decode_sharded_lossless(blob, mesh=Mesh(devices, ("rows",)))
    np.testing.assert_array_equal(out, ref)


def test_sharded_lossless_palette_falls_back():
    from j40_tpu.errors import Unsupported
    from j40_tpu.parallel.sharded_lossless import decode_sharded_lossless

    rng = np.random.default_rng(8)
    pal = rng.integers(0, 255, (5, 3), dtype=np.uint8)
    idx = rng.integers(0, 5, (64, 64))
    img = pal[idx]
    from j40_tpu.encode.advanced import AdvancedOptions, encode_modular_advanced

    blob = encode_modular_advanced(img, options=AdvancedOptions(palette=True))
    with pytest.raises(Unsupported):
        decode_sharded_lossless(blob, n_devices=2)


def test_sharded_mixed_classes_as_compute():
    """Group-aligned shard boundaries: non-8x8 DctSelect classes execute as
    per-class batched transforms inside the shard program (plan.overlay
    stays None); non-aligned geometries materialize the overlay fallback.
    Both match the single-device decoder within +-1."""
    import jax
    from jax.sharding import Mesh

    from j40_tpu.decode import Decoder
    from j40_tpu.encode.vardct_enc import encode_vardct_mixed
    from j40_tpu.parallel.sharded_decode import _run_sharded, plan_frame

    devices = np.asarray(jax.devices()[:2], dtype=object)
    if len(devices) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(devices, ("rows",))
    rng = np.random.default_rng(6)

    def run(height):
        img = (np.cumsum(rng.integers(-2, 3, size=(height, 256, 3)), axis=1)
               % 180 + 30).astype(np.uint8)
        img[:64, :96] = img[3, 3]  # flat band -> non-8x8 varblocks
        blob = encode_vardct_mixed(img)
        plan = plan_frame(blob, owners=2)
        assert plan.classes, "expected non-8x8 classes"
        out = _run_sharded([plan], mesh, ("rows",), False)[0]
        d = Decoder(blob)
        d.decode_frame()
        ref = d.render_rgba8()[:, :, :3]
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1
        return plan

    # 512 px = 2 group rows over 2 shards -> group-aligned, compute mode
    assert run(512).overlay is None
    # 128 px: group alignment infeasible (pad >= shard) -> overlay fallback
    assert run(128).overlay is not None


def test_sharded_unified_entry_dispatches_modular():
    # decode_sharded is the single entry point: a modular (lossless) frame
    # routes to the sharded Squeeze/RCT transform-chain program internally
    import jax
    from jax.sharding import Mesh

    from j40_tpu.encode.encoder import encode_modular
    from j40_tpu.parallel.sharded_decode import decode_sharded

    rng = np.random.default_rng(83)
    img = (np.cumsum(rng.integers(-3, 4, (96, 128, 3)), 1) % 230).astype(
        np.uint8)
    blob = encode_modular(img)
    _, ref = decode_file(blob)
    mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
    out = decode_sharded(blob, mesh=mesh)
    np.testing.assert_array_equal(out, ref[:, :, :3])


def test_sharded_vardct_16bit_output():
    # bpp=12 VarDCT frame rendered at 16 bits by the shard program; the
    # per-sample gate scales with the depth ratio (1 bpp-domain gray level
    # = ceil(65535/4095) = 17 output units)
    import jax
    from jax.sharding import Mesh

    from j40_tpu.decode import Decoder
    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct
    from j40_tpu.parallel.sharded_decode import decode_sharded

    rng = np.random.default_rng(84)
    img = (np.cumsum(np.cumsum(rng.integers(-20, 21, (96, 112, 3)), 0), 1)
           % 3800 + 100).astype(np.uint16)
    cs = encode_vardct(img, VarDCTOptions(bpp=12))
    d = Decoder(cs, apply_filters=True)
    d.decode_frame()
    ref16 = d.render_rgba16()
    mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
    out16 = decode_sharded(cs, mesh=mesh, apply_filters=True, bit_depth=16)
    assert out16.dtype == np.uint16
    assert np.abs(out16.astype(int) - ref16[:, :, :3].astype(int)).max() <= 17
    out8 = decode_sharded(cs, mesh=mesh, apply_filters=True, bit_depth=8)
    ref8 = d.render_rgba8()
    assert np.abs(out8.astype(int) - ref8[:, :, :3].astype(int)).max() <= 1


@pytest.mark.parametrize("subsample", [(0, 0, 0), (1, 0, 1)])
def test_sharded_lossless_ycbcr(subsample):
    # YCbCr modular frames through the sharded path: BT.601 conversion (and
    # chroma replication for subsampled planes) runs inside the shard
    # program; device f32 vs host f64 rounding allows 1 gray level
    import jax
    from jax.sharding import Mesh

    from j40_tpu.encode.encoder import EncodeOptions, encode_modular
    from j40_tpu.parallel.sharded_lossless import decode_sharded_lossless

    rng = np.random.default_rng(85)
    img = (np.cumsum(rng.integers(-3, 4, (96, 128, 3)), 1) % 200).astype(
        np.uint8)
    blob = encode_modular(img, options=EncodeOptions(
        ycbcr=True, ycbcr_subsample=subsample))
    _, ref = decode_file(blob)
    mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
    out = decode_sharded_lossless(blob, mesh=mesh)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_sharded_lossless_alpha_and_16bit():
    # RGBA modular stream: the alpha plane renders from the extra channel
    # (not constant 255); 16-bit output of a 12-bit stream uses the host
    # integer scale-to-depth formula, so it stays bit-exact
    import jax
    from jax.sharding import Mesh

    from j40_tpu.decode import Decoder
    from j40_tpu.encode.encoder import encode_modular
    from j40_tpu.parallel.sharded_lossless import decode_sharded_lossless

    mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))

    rng = np.random.default_rng(86)
    rgba = (np.cumsum(rng.integers(-3, 4, (64, 96, 4)), 1) % 256).astype(
        np.uint8)
    blob = encode_modular(rgba)
    _, ref = decode_file(blob)
    out = decode_sharded_lossless(blob, mesh=mesh)
    np.testing.assert_array_equal(out, ref)
    assert not (out[:, :, 3] == 255).all()  # alpha actually varies

    img12 = (np.cumsum(rng.integers(-9, 10, (64, 96, 3)), 1) % 4096).astype(
        np.uint16)
    blob12 = encode_modular(img12, bpp=12)
    d = Decoder(blob12)
    d.decode_frame()
    ref16 = d.render_rgba16()
    out16 = decode_sharded_lossless(blob12, mesh=mesh, bit_depth=16)
    np.testing.assert_array_equal(out16, ref16)


def test_sharded_batch_shape_buckets():
    # unequal-dims batch: plans bucket by geometry, each bucket runs as one
    # sharded program (padded to the img axis), outputs return in order
    import jax
    from jax.sharding import Mesh

    from j40_tpu.encode.vardct_enc import encode_vardct
    from j40_tpu.parallel.sharded_decode import decode_sharded_batch

    _require_devices(8)
    rng = np.random.default_rng(87)
    dims = [(96, 320), (64, 256), (96, 320)]
    imgs = [
        (np.cumsum(rng.integers(-2, 3, size=(h, w, 3)), axis=1) % 180 + 30)
        .astype(np.uint8)
        for h, w in dims
    ]
    blobs = [encode_vardct(im) for im in imgs]
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("img", "rows"))
    outs = decode_sharded_batch(blobs, mesh, apply_filters=False)
    assert [o.shape[:2] for o in outs] == dims
    for blob, out in zip(blobs, outs):
        _, ref = decode_file(blob)
        assert np.abs(out.astype(int) - ref[:, :, :3].astype(int)).max() <= 1


def test_sharded_lossless_grayscale_and_16bit_modular_entry():
    # grayscale modular frames replicate the single color channel across
    # RGB inside the shard program; the unified decode_sharded entry also
    # serves 16-bit output for modular frames (bit-exact integer scaling)
    import jax
    from jax.sharding import Mesh

    from j40_tpu.decode import Decoder
    from j40_tpu.encode.encoder import encode_modular
    from j40_tpu.parallel.sharded_decode import decode_sharded
    from j40_tpu.parallel.sharded_lossless import decode_sharded_lossless

    mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
    rng = np.random.default_rng(88)

    gray = (np.cumsum(rng.integers(-3, 4, (64, 96, 1)), 1) % 256).astype(
        np.uint8)
    blob = encode_modular(gray)
    _, ref = decode_file(blob)
    out = decode_sharded_lossless(blob, mesh=mesh)
    np.testing.assert_array_equal(out, ref)
    assert (out[:, :, 0] == out[:, :, 1]).all()

    img12 = (np.cumsum(rng.integers(-9, 10, (64, 96, 3)), 1) % 4096).astype(
        np.uint16)
    blob12 = encode_modular(img12, bpp=12)
    d = Decoder(blob12)
    d.decode_frame()
    ref16 = d.render_rgba16()
    out16 = decode_sharded(blob12, mesh=mesh, bit_depth=16)
    np.testing.assert_array_equal(out16, ref16[:, :, :3])
