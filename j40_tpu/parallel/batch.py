"""Batched multi-image decode (BASELINE config 5 shape).

Host-side entropy stages for many images run on a thread pool (the native
core releases the GIL).  Device reconstruction is **cross-image batched**:
same-shape all-DCT8x8 images are stacked along the block axis and decoded
by ONE fused kernel dispatch and ONE fetch — on this dev host the TPU
tunnel charges per-transfer latency, so 2 big RPCs beat 2xB small ones by
an order of magnitude, and the MXU sees one large matmul batch instead of
B small ones.  Heterogeneous batches fall back to per-image round-robin
placement over the available devices.

The collective-using sharded step (psum checksum over an (img, grp) mesh)
lives in j40_tpu.parallel.sharded_decode / __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def decode_batch(
    blobs: list[bytes],
    workers: int = 8,
    backend: str = "jax",
    per_image_workers: int = 1,
) -> list[np.ndarray]:
    """Decode many .jxl byte blobs; returns a list of (h, w, 4) uint8 RGBA."""
    from ..decode import resolve_backend

    backend = resolve_backend(backend)
    if backend in ("jax", "device") and len(blobs) > 1:
        out = _decode_batch_fused(blobs, workers)
        if out is not None:
            return out
    return _decode_batch_roundrobin(blobs, workers, backend, per_image_workers)


def _plan_gate(d):
    """Uniform-batch eligibility gate shared by the dense and packed plans:
    returns (vs, gg) for an all-DCT8x8 single-LF-group stream, else None."""
    f, _toc, state = d._deferred
    vs = state.vardct
    if (
        vs is None
        or f.num_lf_groups != 1
        or d.image.bpp != 8
        or not f.is_last
        or f.log_upsampling
        or getattr(state, "apply_filters", False)
    ):
        return None
    gg = vs.lf_groups[0]
    if not ((np.asarray(gg.blocks) >> 20) == 2).all():
        return None  # mixed DctSelect: fall back
    return vs, gg


def _plan_uniform(d):
    """Build the all-DCT8x8 fused-reconstruction plan for one deferred
    decoder, or None when the stream doesn't fit the uniform batch shape."""
    from ..ops.combine_jax import gather_full_dct8

    g = _plan_gate(d)
    if g is None:
        return None
    vs, gg = g
    return gather_full_dct8(vs, gg, d.image, d._deferred[0])


def _plan_uniform_packed(d):
    """Like `_plan_uniform` but the coefficient gather and int8 upload pack
    run as ONE native pass (`ops.combine_jax.gather_pack_dct8_i8`) — the
    serving path's per-image host cost must stay below the host backend's
    native reconstruct for the device leg to win.  Returns
    ((i8, exc_idx, exc_val, n_gt7, fill0), aux, weights, consts) or None."""
    from ..ops.combine_jax import gather_pack_dct8_i8

    g = _plan_gate(d)
    if g is None:
        return None
    vs, gg = g
    return gather_pack_dct8_i8(vs, gg, d.image, d._deferred[0])


def _plans_match(plans, decs):
    """All images must share geometry and quant constants for cross-image
    stacking; returns (h8, w8) or None."""
    gg0 = decs[0]._deferred[2].vardct.lf_groups[0]
    h8, w8 = gg0.height8, gg0.width8
    weights0, consts0 = plans[0][2], plans[0][3]
    for (c, a, w, k), d in zip(plans, decs):
        gg = d._deferred[2].vardct.lf_groups[0]
        if (
            (gg.height8, gg.width8) != (h8, w8)
            or w.tobytes() != weights0.tobytes()
            or k.tobytes() != consts0.tobytes()
        ):
            return None
    return h8, w8


def _decode_batch_fused(blobs, workers):
    """One-dispatch batched reconstruction; returns None if the batch is not
    uniform (different sizes / not all-DCT8x8 / unequal quant constants)."""
    import jax.numpy as jnp

    from ..decode import Decoder
    from ..ops.pallas_kernels import pallas_available, reconstruct_dct8_full

    if not pallas_available():
        return None

    def phase1(blob):
        d = Decoder(blob, backend="jax")
        d.decode_frame(_defer_finish=True)
        return d

    with ThreadPoolExecutor(max_workers=max(1, workers)) as ex:
        decs = list(ex.map(phase1, blobs))

    plans = []
    for d in decs:
        p = _plan_uniform(d)
        if p is None:
            return None
        plans.append(p)

    geom = _plans_match(plans, decs)
    if geom is None:
        return None
    h8, w8 = geom
    weights0, consts0 = plans[0][2], plans[0][3]

    from ..ops.combine_jax import _pack_i8

    # fixed-size chunks keep the jit signature stable across batch sizes
    # (one compile per image shape); partial chunks zero-pad.  All chunk
    # dispatches are issued before any fetch so uploads/compute/fetches
    # pipeline through the runtime's async queue.
    B = len(plans)
    CHUNK = 16  # constant so a small warmup batch compiles the same shape
    n = h8 * w8
    devs = []
    for g0 in range(0, B, CHUNK):
        part = plans[g0 : g0 + CHUNK]
        dense = np.concatenate([p[0] for p in part], axis=1)
        aux = np.concatenate([p[1] for p in part], axis=1)
        if len(part) < CHUNK:
            pad = (CHUNK - len(part)) * n
            dense = np.pad(dense, ((0, 0), (0, pad), (0, 0)))
            aux = np.pad(aux, ((0, 0), (0, pad)))
        cup, exc_idx, exc_val = _pack_i8(dense)
        devs.append(
            reconstruct_dct8_full(
                jnp.asarray(cup), jnp.asarray(exc_idx), jnp.asarray(exc_val),
                jnp.asarray(aux), jnp.asarray(weights0), jnp.asarray(consts0),
                CHUNK * h8, w8, True,
            )
        )

    results = []
    H = h8 * 8
    for g0, dev in zip(range(0, B, CHUNK), devs):
        stacked = np.asarray(dev)  # (3, CHUNK*H, w8*8) uint8 — one fetch
        for j, d in enumerate(decs[g0 : g0 + CHUNK]):
            gg = d._deferred[2].vardct.lf_groups[0]
            chunk = stacked[:, j * H : j * H + gg.height, : gg.width]
            d._deferred[2].vardct._predispatched[0] = (
                chunk, gg.height, gg.width,
            )
            d.finish_frame()
            results.append(d)
    with ThreadPoolExecutor(max_workers=max(1, workers)) as ex:
        return list(ex.map(lambda d: d.render_rgba8(), results))


def decode_batch_device(
    blobs: list[bytes],
    workers: int = 8,
    chunk: int = 16,
    fetch: bool = False,
    stats_out: dict | None = None,
):
    """Serving-shape batched decode: host entropy pipelined against device
    transfers, device-resident RGBA output (BASELINE config-5 on the TPU).

    Per chunk of `chunk` images: as soon as that chunk's entropy phase
    completes on the thread pool, coefficients are packed to the narrowest
    lossless upload form (auto 4-bit nibbles / int8 + exception lists,
    `ops.combine_jax.pack_coeffs_auto`) and the fused
    dequant+CfL+IDCT+XYB->sRGB kernel is dispatched; JAX's async runtime
    overlaps chunk k's upload/compute with chunk k+1's host entropy.  The
    result stays on the device as one (B, H, W, 4) uint8 array — the shape a
    jax model consumes directly, with zero device->host bytes (the format's
    per-section independence that makes this batchable: j40.h:447,
    7749-7776).

    Returns the device array (or the fetched numpy array when `fetch`).
    Raises ValueError when the batch is not uniform (the host paths in
    `decode_batch` handle those).  When `stats_out` is given, records the
    per-stage account: entropy/pack/dispatch/ready wall times and upload
    bytes, so recorded throughput is auditable against the host<->device
    link floor."""
    import time

    import jax
    import jax.numpy as jnp

    from ..decode import Decoder
    from ..ops.pallas_kernels import pallas_available

    if not pallas_available():
        raise ValueError("device batch path needs the TPU Pallas backend")

    t0 = time.perf_counter()

    def phase1(blob):
        # entropy decode + fused native gather-and-pack, all GIL-released
        # in the native core — the main thread only assembles slabs, so
        # upload preparation scales with the pool instead of serializing
        # between chunk dispatches
        d = Decoder(blob, backend="jax")
        d.decode_frame(_defer_finish=True)
        return d, _plan_uniform_packed(d)

    stats = {
        "images": len(blobs), "chunk": chunk,
        "upload_bytes": 0, "pack_s": 0.0, "entropy_s": 0.0,
        "dispatch_block_s": 0.0,
    }
    devs = []
    ex = ThreadPoolExecutor(max_workers=max(1, workers))
    try:
        futs = [ex.submit(phase1, b) for b in blobs]
        geom = None
        dweights = dconsts = None
        for pos in range(0, len(futs), chunk):
            te0 = time.perf_counter()
            pairs = [ft.result() for ft in futs[pos : pos + chunk]]
            stats["entropy_s"] += time.perf_counter() - te0
            decs = [d for d, _ in pairs]
            plans = [p for _, p in pairs]
            if any(p is None for p in plans):
                raise ValueError("non-uniform batch (mixed DctSelect/shape)")
            g = _plans_match(plans, decs)
            if g is None or (geom is not None and g != geom):
                raise ValueError("non-uniform batch (geometry/constants)")
            if geom is None:
                geom = g
                wc_key = (plans[0][2].tobytes(), plans[0][3].tobytes())
                dweights = jax.device_put(plans[0][2])
                dconsts = jax.device_put(plans[0][3])
            elif (plans[0][2].tobytes(), plans[0][3].tobytes()) != wc_key:
                raise ValueError("non-uniform batch (geometry/constants)")
            h8, w8 = geom
            tp0 = time.perf_counter()
            kind, cup, exc_idx, exc_val, aux, kgrids = _assemble_chunk(
                plans, chunk, h8 * w8, h8, w8)
            stats["pack_s"] += time.perf_counter() - tp0
            stats["upload_bytes"] += (
                cup.nbytes + exc_idx.nbytes + exc_val.nbytes + aux.nbytes
                + kgrids.nbytes
            )
            stats.setdefault("pack_kind", kind)
            td0 = time.perf_counter()
            devs.append(
                _chunk_rgba(
                    jax.device_put(cup), jax.device_put(exc_idx),
                    jax.device_put(exc_val), jax.device_put(aux),
                    dweights, dconsts, kind, chunk, h8, w8,
                    kgrids=jax.device_put(kgrids),
                )
            )
            stats["dispatch_block_s"] += time.perf_counter() - td0
    finally:
        ex.shutdown(wait=False)
    stats["dispatch_issued_s"] = time.perf_counter() - t0
    out = jnp.concatenate(devs, axis=0)[: len(blobs)] if len(devs) > 1 \
        else devs[0][: len(blobs)]
    out.block_until_ready()
    stats["ready_s"] = time.perf_counter() - t0
    if fetch:
        tf0 = time.perf_counter()
        # force a device-side copy into a fresh buffer first: fetching the
        # kernel's transposed RGBA output directly goes through an
        # element-wise relayout on the transfer path (measured 79 s for
        # 4 MB on this host vs 0.3 s after the copy)
        out = _fetch_copy(out)
        out = np.asarray(out)
        stats["fetch_s"] = time.perf_counter() - tf0
    stats["total_s"] = time.perf_counter() - t0
    if stats_out is not None:
        stats_out.update(stats)
    return out


@functools.lru_cache(maxsize=1)
def _fetch_copy_jit():
    import jax
    import jax.numpy as jnp

    return jax.jit(lambda x: x + jnp.uint8(0))


def _fetch_copy(x):
    return _fetch_copy_jit()(x)


def _assemble_chunk(plans, chunk, n, h8, w8):
    """Assemble one chunk's upload buffers from the per-image int8 packs
    produced inside the phase1 workers (fused native gather+pack; see
    `ops.combine_jax.gather_pack_dct8_i8`).  The main thread does only slab
    copies here, so nothing heavy serializes between chunk dispatches.
    Chooses the narrower lossless upload form (4-bit nibbles vs int8,
    exceptions exact either way) from the packs' exact census.  Exception
    indices are remapped from per-image flat positions to chunk-flat
    positions.  Returns (kind, cup, exc_idx, exc_val, aux)."""
    N = chunk * n
    n64, N64 = n * 64, N * 64
    h64, w64 = -(-h8 // 8), -(-w8 // 8)
    aux = np.zeros((4, N), np.float32)
    kgrids = np.zeros((chunk, 2, h64, w64), np.float32)
    total = 3 * n64 * len(plans)
    gt7 = sum(p[0][3] for p in plans)
    gt127 = sum(len(p[0][1]) for p in plans)
    kind = "i4" if 0.5 + 8 * gt7 / total < 1.0 + 8 * gt127 / total else "i8"
    cup8 = np.zeros((3, N, 64), np.int8)
    idx_parts, val_parts = [], []
    for i, ((i8buf, eidx, eval_, _, _), aux_i, _, _) in enumerate(plans):
        cup8[:, i * n : (i + 1) * n] = i8buf
        if len(eidx):
            c, within = np.divmod(eidx.astype(np.int64), n64)
            idx_parts.append((c * N64 + i * n64 + within).astype(np.int32))
            val_parts.append(eval_)
        aux[:, i * n : (i + 1) * n] = aux_i[:4]
        # kx/kb are constant per 64px tile (see _chunk_rgba): keep the
        # (h64, w64) grid, expand on device
        kgrids[i, 0] = aux_i[4].reshape(h8, w8)[::8, ::8]
        kgrids[i, 1] = aux_i[5].reshape(h8, w8)[::8, ::8]
    if kind == "i8":
        cup = cup8
        nexc = sum(len(x) for x in idx_parts)
    else:
        # values in (7, 127] are exact in the int8 slab; values beyond 127
        # come from the workers' exception lists.  One native pass does the
        # nibble pack + exception extraction (j40t_pack_i4_chunk); numpy
        # chain kept as the no-library fallback.
        from ..native.bindings import pack_i4_chunk

        native = pack_i4_chunk(cup8, exc_hint=gt7 + 64)
        if native is not None:
            cup, f, vals = native
        else:
            u = (np.clip(cup8, -8, 7).astype(np.int8) + 8).view(np.uint8)
            cup = u[..., 0::2] | (u[..., 1::2] << 4)
            flat8 = cup8.reshape(-1)
            f = np.flatnonzero(np.abs(flat8) > 7).astype(np.int32)
            vals = flat8[f].astype(np.int32)
        if idx_parts:
            big_idx = np.concatenate(idx_parts)
            pos = np.searchsorted(f, big_idx)
            vals[pos] = np.concatenate(val_parts)
        idx_parts, val_parts = [f], [vals]
        nexc = len(f)
    cap = max(64, 1 << int(nexc).bit_length())
    exc_idx = np.zeros(cap, np.int32)
    # the fill slots scatter the true value of chunk-flat position 0
    exc_val = np.full(cap, np.int32(plans[0][0][4]), np.int32)
    if nexc:
        exc_idx[1 : 1 + nexc] = np.concatenate(idx_parts)
        exc_val[1 : 1 + nexc] = np.concatenate(val_parts)
    return kind, cup, exc_idx, exc_val, aux, kgrids


_chunk_rgba_jit = None


def _chunk_rgba(cup, exc_idx, exc_val, aux, weights, consts, kind,
                chunk, h8, w8, kgrids=None):
    """One fused dispatch: packed coefficients -> (chunk, H, W, 4) u8 RGBA,
    everything device-side (unpack, exception scatter, Pallas reconstruct,
    RGBA assembly).  The jit wrapper is module-cached so repeated chunks
    reuse one executable.

    With `kgrids` (chunk, 2, h64, w64), `aux` carries only rows 0-3
    (LLF x/y/b + hfmul_inv) and the per-64px-tile CfL factor rows (kx, kb)
    are expanded on device from the tiny grids — they are constant per
    tile by construction (combine_jax._plan_aux_dct8), so the expansion is
    exact and the upload drops by two full block planes."""
    global _chunk_rgba_jit
    if _chunk_rgba_jit is None:
        import functools

        import jax

        @functools.partial(
            jax.jit, static_argnames=("kind", "chunk", "h8", "w8"))
        def run(cup, exc_idx, exc_val, aux, weights, consts,
                kind, chunk, h8, w8, kgrids=None):
            import jax.numpy as jnp

            from ..ops.combine_jax import unpack_i4_jax
            from ..ops.pallas_kernels import reconstruct_dct8_full

            if kgrids is not None:
                g = jnp.repeat(jnp.repeat(kgrids, 8, axis=2), 8, axis=3)
                g = g[:, :, :h8, :w8]                  # (chunk, 2, h8, w8)
                rows = g.transpose(1, 0, 2, 3).reshape(2, -1)
                aux = jnp.concatenate([aux, rows], axis=0)

            if kind == "f32":
                # dense on-device planes (the on-chip HF entropy path):
                # no exception scatter needed
                from ..ops.pallas_kernels import reconstruct_dct8_srgb_pallas

                srgb = jnp.clip(
                    reconstruct_dct8_srgb_pallas(
                        cup, aux[0:3], aux[3], aux[4], aux[5],
                        weights, consts, chunk * h8, w8),
                    0, 255).astype(jnp.uint8)
            else:
                if kind == "i4":
                    coeffs = unpack_i4_jax(cup, (3, chunk * h8 * w8, 64))
                else:
                    coeffs = cup
                srgb = reconstruct_dct8_full(
                    coeffs, exc_idx, exc_val, aux, weights, consts,
                    chunk * h8, w8, True,
                )  # (3, chunk*H, W) uint8
            H, W = h8 * 8, w8 * 8
            rgb = srgb.reshape(3, chunk, H, W).transpose(1, 2, 3, 0)
            alpha = jnp.full((chunk, H, W, 1), jnp.uint8(255))
            return jnp.concatenate([rgb, alpha], axis=-1)

        _chunk_rgba_jit = run

    return _chunk_rgba_jit(cup, exc_idx, exc_val, aux, weights, consts,
                           kind, chunk, h8, w8, kgrids)


def _decode_batch_roundrobin(blobs, workers, backend, per_image_workers):
    import jax

    from ..decode import Decoder

    devices = jax.devices() if backend == "jax" else [None]

    def one(i_blob):
        i, blob = i_blob
        dev = devices[i % len(devices)]

        def run():
            d = Decoder(blob, backend=backend, workers=per_image_workers)
            d.decode_frame()
            return d.render_rgba8()

        if dev is not None:
            with jax.default_device(dev):
                return run()
        return run()

    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(one, enumerate(blobs)))


@functools.lru_cache(maxsize=4)
def _assemble_hf_jit():
    import jax

    @functools.partial(jax.jit)
    def run(dense, lane_b, cell_b):
        # dense (L, 3, ncmax, 64) -> (3, n, 64) image-raster blocks
        img = dense[lane_b, :, cell_b, :]          # (n, 3, 64)
        return img.transpose(1, 0, 2)

    return run


@functools.lru_cache(maxsize=4)
def _assemble_hf_chunk_jit():
    import jax

    @functools.partial(jax.jit)
    def run(dense, lane_b, cell_b, lane_offs):
        # dense (L, 3, ncmax, 64); lane_b/cell_b (n,) shared across the
        # uniform batch; lane_offs (k,) per-image lane bases.  One dispatch
        # assembles a whole chunk: (3, k*n, 64) image-raster blocks.
        lanes = lane_b[None, :] + lane_offs[:, None]       # (k, n)
        cells = jax.numpy.broadcast_to(cell_b[None, :], lanes.shape)
        img = dense[lanes, :, cells, :]                    # (k, n, 3, 64)
        k, n = lanes.shape
        return img.transpose(2, 0, 1, 3).reshape(3, k * n, 64)

    return run


def decode_batch_device_hf(
    blobs: list[bytes],
    workers: int = 8,
    chunk: int = 16,
    fetch: bool = False,
    stats_out: dict | None = None,
):
    """Serving-shape batched decode with ON-CHIP HF entropy decode: the host
    parses only headers + LF metadata per image (Decoder max_passes=0);
    pass-group sections upload their raw BYTES and decode in the Pallas HF
    kernel (ops/pallas_hf.py); dense coefficient planes stay on device and
    feed the fused reconstruction.  Upload is ~section bytes + aux instead
    of the coefficient planes — the lever that beats a slow host link.

    Per-image kernel launches run async; stream-end/ANS validation is one
    batched fetch at the end (j40.h:2884-2897 checks preserved).  Output:
    device-resident (B, H, W, 4) uint8."""
    import time

    import jax
    import jax.numpy as jnp

    from ..decode import Decoder
    from ..io.bits import ceil_lg
    from ..ops import pallas_hf as ph
    from ..ops.combine_jax import _plan_aux_dct8
    from ..ops.device_vardct import YXB2XYB, _prepare_hf_lane
    from ..ops.device_modular import _check_lane_end
    from ..ops.pallas_kernels import pallas_available

    if not pallas_available():
        raise ValueError("device batch path needs the TPU Pallas backend")
    t0 = time.perf_counter()

    def phase1(blob):
        d = Decoder(blob, backend="jax", max_passes=0)
        d.decode_frame(_defer_finish=True)
        return d

    stats = {
        "images": len(blobs), "chunk": chunk, "upload_bytes": 0,
        "lf_s": 0.0, "launch_s": 0.0,
    }
    ex = ThreadPoolExecutor(max_workers=max(1, workers))
    try:
        futs = [ex.submit(phase1, b) for b in blobs]
        pend = []
        geom = None
        for ft in futs:
            tl0 = time.perf_counter()
            d = ft.result()
            stats["lf_s"] += time.perf_counter() - tl0
            f, toc, state = d._deferred
            vd = state.vardct
            if (f.num_lf_groups != 1 or f.num_passes != 1
                    or d.image.bpp != 8 or not f.is_last):
                raise ValueError("non-uniform batch (shape/passes)")
            spec = vd.coeff_codespec[0]
            if not ph.hf_spec_is_device_simple(spec):
                raise ValueError("coefficient spec not device-simple")
            gg = vd.lf_groups[0]
            blocks_arr = np.asarray(gg.blocks)
            if not ((blocks_arr >> 20) == 2).all():
                raise ValueError("non-DCT8 varblocks")
            if geom is None:
                geom = (gg.height8, gg.width8)
            elif geom != (gg.height8, gg.width8):
                raise ValueError("non-uniform batch (geometry)")
            preset_bits = ceil_lg(vd.num_hf_presets)
            lanes = []
            for sct in toc.sections:
                if sct.pass_ != 0:
                    continue
                ln = _prepare_hf_lane(d, state, f, vd, sct, preset_bits)
                if ln is None:
                    raise ValueError("ineligible pass section")
                lanes.append(ln)
            streams = [(ln.data, ln.bitoff) for ln in lanes]
            ncells = [ln.gw8 * ln.gh8 for ln in lanes]
            orders_yxb = np.stack([
                np.asarray(vd.orders[0][0][YXB2XYB[c]], np.int32)
                for c in range(3)])
            stats["upload_bytes"] += sum(len(ln.data) for ln in lanes)

            h8, w8 = gg.height8, gg.width8
            lane_b = np.empty(h8 * w8, np.int32)
            cell_b = np.empty(h8 * w8, np.int32)
            for li, ln in enumerate(lanes):
                ys = np.arange(ln.gy8, ln.gy8 + ln.gh8)
                xs = np.arange(ln.gx8, ln.gx8 + ln.gw8)
                bb = (ys[:, None] * w8 + xs[None, :]).ravel()
                lane_b[bb] = li
                cell_b[bb] = np.arange(ln.gh8 * ln.gw8)
            voffs = (blocks_arr & 0xFFFFF).reshape(-1)
            offs = np.asarray(gg.vb_coeffoff)[voffs]
            aux, weights, consts = _plan_aux_dct8(
                vd, gg, d.image, f, voffs, offs)
            pend.append(dict(
                lanes=lanes, spec=spec, streams=streams, ncells=ncells,
                orders=orders_yxb, lane_b=lane_b, cell_b=cell_b, aux=aux,
                weights=weights, consts=consts))

        # multi-spec kernel calls at full lane occupancy: pack images'
        # section lanes into <=128-lane calls; one call decodes sections
        # of many images against their own (stacked) code specs
        tk0 = time.perf_counter()
        calls, cur, cur_n = [], [], 0
        for pe in pend:
            ln_count = len(pe["streams"])
            if cur and cur_n + ln_count > 128:
                calls.append(cur)
                cur, cur_n = [], 0
            cur.append(pe)
            cur_n += ln_count
        if cur:
            calls.append(cur)
        ncmax = max(max(pe["ncells"]) for pe in pend)
        # two-stage: dispatch EVERY call group's kernel + scatter first
        # (async, no host sync), then confirm completion — the snapshot
        # fetches serialize only against already-pipelined device work
        handles = []
        for group in calls:
            lane_groups = [(pe["streams"], pe["ncells"], pe["spec"],
                            pe["orders"]) for pe in group]
            handles.append(ph.launch_hf_multi_async(lane_groups, ncmax))
        for group, h in zip(calls, handles):
            coeffs_dev, st_dev = ph.finish_hf_multi(h)
            off = 0
            for pe in group:
                pe["coeffs"] = coeffs_dev
                pe["lane_off"] = off
                pe["st"] = st_dev
                pe["st_off"] = off
                off += len(pe["streams"])
        stats["launch_s"] += time.perf_counter() - tk0
        stats["kernel_calls"] = len(calls)

        h8, w8 = geom
        n = h8 * w8
        asm = _assemble_hf_jit()
        asm_chunk = _assemble_hf_chunk_jit()
        dweights = jax.device_put(pend[0]["weights"])
        dconsts = jax.device_put(pend[0]["consts"])
        dummy = jnp.zeros(1, jnp.int32)
        # uniform batches share one section layout, so the gather index
        # planes upload ONCE and each chunk assembles in a single dispatch
        # (per-image dispatches cost a tunnel round each — measured ~0.6 s
        # of the warm 1.1 s serve on this host's 27 ms-RTT link)
        uniform_idx = all(
            np.array_equal(pe["lane_b"], pend[0]["lane_b"])
            and np.array_equal(pe["cell_b"], pend[0]["cell_b"])
            for pe in pend[1:])
        if uniform_idx:
            dlane = jnp.asarray(pend[0]["lane_b"])
            dcell = jnp.asarray(pend[0]["cell_b"])
        devs = []
        for pos in range(0, len(pend), chunk):
            part = pend[pos:pos + chunk]
            if uniform_idx:
                # consecutive images sharing one kernel-call coeffs array
                # assemble together; a chunk rarely spans more than two
                runs: list = []
                for pe in part:
                    if runs and runs[-1][0] is pe["coeffs"]:
                        runs[-1][1].append(pe)
                    else:
                        runs.append((pe["coeffs"], [pe]))
                pad = chunk - len(part)
                parts = []
                for ri, (cf, pes) in enumerate(runs):
                    offs = [pe["lane_off"] for pe in pes]
                    if ri == len(runs) - 1 and pad:
                        offs += [offs[-1]] * pad  # ragged tail: repeat last
                    parts.append(asm_chunk(
                        cf, dlane, dcell,
                        jnp.asarray(np.asarray(offs, np.int32))))
                coeffs = (parts[0] if len(parts) == 1
                          else jnp.concatenate(parts, axis=1))
            else:
                imgs = [asm(pe["coeffs"],
                            jnp.asarray(pe["lane_b"] + pe["lane_off"]),
                            jnp.asarray(pe["cell_b"])) for pe in part]
                while len(imgs) < chunk:  # ragged tail: repeat the last
                    imgs.append(imgs[-1])
                coeffs = jnp.concatenate(imgs, axis=1)
            h64, w64 = -(-h8 // 8), -(-w8 // 8)
            aux = np.zeros((4, chunk * n), np.float32)
            kgrids = np.zeros((chunk, 2, h64, w64), np.float32)
            for i, pe in enumerate(part):
                aux[:, i * n:(i + 1) * n] = pe["aux"][:4]
                kgrids[i, 0] = pe["aux"][4].reshape(h8, w8)[::8, ::8]
                kgrids[i, 1] = pe["aux"][5].reshape(h8, w8)[::8, ::8]
            stats["upload_bytes"] += aux.nbytes + kgrids.nbytes
            devs.append(_chunk_rgba(
                coeffs, dummy, dummy, jax.device_put(aux),
                dweights, dconsts, "f32", chunk, h8, w8,
                kgrids=jax.device_put(kgrids)))
        out = (jnp.concatenate(devs, axis=0)[: len(blobs)]
               if len(devs) > 1 else devs[0][: len(pend)])
        out.block_until_ready()
        stats["ready_s"] = time.perf_counter() - t0

        # batched validation: one fetch for every call's machine snapshot
        sts = jax.device_get([pe["st"] for pe in pend])
        for pe, stn in zip(pend, sts):
            o = pe["st_off"]
            L = len(pe["lanes"])
            if not stn[7, o:o + L].all() or stn[6, o:o + L].any():
                raise ValueError("device HF decode failed validation")
            for li, ln in enumerate(pe["lanes"]):
                base = (ln.bitoff // 8) & ~1
                _check_lane_end(
                    ln, base * 8 + int(stn[1, o + li]),
                    pe["spec"].use_prefix_code, int(stn[0, o + li]))
    finally:
        ex.shutdown(wait=False)

    if fetch:
        tf0 = time.perf_counter()
        out = _fetch_copy(out)
        out = np.asarray(out)
        stats["fetch_s"] = time.perf_counter() - tf0
    stats["total_s"] = time.perf_counter() - t0
    if stats_out is not None:
        stats_out.update(stats)
    return out
