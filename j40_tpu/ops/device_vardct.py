"""Device-side VarDCT HF coefficient decode of pass-group sections.

The VarDCT dual of ops/device_modular.py: eligible pass-group sections
upload their raw section BYTES and decode in SIMD lockstep on the chip
(ops/pallas_hf.py — one lane per section, per-section stream isolation per
reference j40.h:7749-7776), replacing the host entropy + coefficient-plane
upload.  Eligibility (anything else falls back to the host path with
identical results):

- single-pass frame, single-cluster LZ77-free coefficient spec
  (the context model then cannot change the symbol sequence)
- every cell of the section is a DCT8 varblock corner (j40.h:6915)

Correctness gates mirror the host: per-lane "coef" structure errors, the
final ANS state (j40.h:2884-2891), and section padding/end checks
(j40.h:2011-2016) are all enforced from the kernel's machine snapshot.
"""

from __future__ import annotations

import time

import numpy as np

from ..errors import check
from ..io.bits import ceil_lg
from ..mathutil import ceil_div
from .device_modular import _check_lane_end

YXB2XYB = (1, 0, 2)


class _HfLane:
    __slots__ = ("section", "data", "bitoff", "gg", "ggidx", "gx8", "gy8",
                 "gw8", "gh8")

    def __init__(self, section, data, bitoff, gg, ggidx, gx8, gy8, gw8, gh8):
        self.section = section
        self.data = data
        self.bitoff = bitoff
        self.gg = gg
        self.ggidx = ggidx
        self.gx8 = gx8
        self.gy8 = gy8
        self.gw8 = gw8
        self.gh8 = gh8


def _prepare_hf_lane(dec, state, f, vd, s, preset_bits):
    row, col = divmod(s.idx, f.gcolumns)
    ggidx = (row // 8) * f.ggcolumns + (col // 8)
    gg = vd.lf_groups.get(ggidx)
    if gg is None or gg.blocks is None:
        return None
    gx8 = ((col % 8) << f.group_size_shift) // 8
    gy8 = ((row % 8) << f.group_size_shift) // 8
    gw8 = ceil_div(min(f.width - (col << f.group_size_shift), f.group_size), 8)
    gh8 = ceil_div(min(f.height - (row << f.group_size_shift), f.group_size), 8)
    rect = gg.blocks[gy8:gy8 + gh8, gx8:gx8 + gw8]
    if rect.shape != (gh8, gw8) or not (rect >> 20 == 2).all():
        return None  # non-DCT8 varblocks -> host path
    data = dec.src.read(s.codeoff, s.size)
    return _HfLane(s, data, preset_bits, gg, ggidx, gx8, gy8, gw8, gh8)


def try_device_hf_sections(dec, state, f, sections) -> list:
    """Decode eligible DCT8 pass-group sections on device; write their
    coefficient planes into the owning LF groups; return handled sections."""
    if not sections or f.num_passes != 1:
        return []
    vd = state.vardct
    if vd is None or not vd.coeff_codespec:
        return []
    spec = vd.coeff_codespec[0]

    from . import pallas_hf as ph
    from .pallas_kernels import pallas_available

    if not pallas_available():
        return []
    simple = ph.hf_spec_is_device_simple(spec)
    ctx_mode = not simple and ph.spec_is_pallas_ctx(spec)
    if not (simple or ctx_mode):
        return []
    if vd.orders is None or vd.orders[0][0][0] is None:
        return []

    preset_bits = ceil_lg(vd.num_hf_presets)
    lanes = [
        ln for s in sections
        if (ln := _prepare_hf_lane(dec, state, f, vd, s, preset_bits))
    ]
    if not lanes:
        return []

    orders_yxb = np.stack([
        np.asarray(vd.orders[0][0][YXB2XYB[cyxb]], np.int32)
        for cyxb in range(3)
    ])

    # batch lanes in LF-group-contiguous order so one gg never splits
    # across kernel calls (a gg has <= 64 member groups, cap is 128)
    by_gg: dict[int, list] = {}
    for ln in lanes:
        by_gg.setdefault(ln.ggidx, []).append(ln)
    batches: list[list] = []
    cur: list = []
    for glanes in by_gg.values():
        if cur and len(cur) + len(glanes) > 128:
            batches.append(cur)
            cur = []
        cur.extend(glanes)
    if cur:
        batches.append(cur)

    # device-resident route: when a gg's DCT8 grid is FULLY covered by this
    # dispatch (single pass, so nothing else accumulates into it), the
    # coefficients never come back to the host — the per-gg plane assembles
    # on device and reconstructs with the same fused kernel the jax combine
    # would use, and combine() consumes the predispatched u8 planes.  The
    # alternative (fetch dense f32, rescatter, re-upload) costs ~3 tunnel
    # passes of the coefficient planes.
    resident_ok = not getattr(state, "apply_filters", False)
    full_cover = {
        ggidx: sum(ln.gw8 * ln.gh8 for ln in glanes)
        == by_gg[ggidx][0].gg.width8 * by_gg[ggidx][0].gg.height8
        for ggidx, glanes in by_gg.items()
    }

    t0 = time.perf_counter()
    out = []
    resident = 0
    for batch in batches:
        done = _decode_hf_batch(dec, state, vd, spec, batch, orders_yxb,
                                resident_ok, full_cover, ctx_mode)
        if done:
            out.extend(ln.section for ln in batch)
            resident += done - 1  # done = 1 + resident gg count
    stats = dec.stats.setdefault("device_vardct", {})
    stats["lanes"] = stats.get("lanes", 0) + len(lanes)
    stats["kernel"] = "ctx" if ctx_mode else "simple"
    stats["resident_ggs"] = stats.get("resident_ggs", 0) + resident
    stats["hf_s"] = stats.get("hf_s", 0.0) + (time.perf_counter() - t0)
    return out


def _lane_bctx3(vd, ln) -> "np.ndarray":
    """Per-cell YXB block contexts of one DCT8 section, packed 10 bits
    apart (the host half of the device context model: j40.h:6923-6934 —
    qfidx/lfidx/block_ctx_map are LF products, known before HF decode)."""
    gg = ln.gg
    sub = np.asarray(gg.blocks[ln.gy8:ln.gy8 + ln.gh8,
                               ln.gx8:ln.gx8 + ln.gw8])
    voffs = sub & 0xFFFFF
    qf = np.asarray(gg.vb_qfidx)[voffs].astype(np.int64)
    lf = np.asarray(gg.lfindices[ln.gy8:ln.gy8 + ln.gh8,
                                 ln.gx8:ln.gx8 + ln.gw8]).astype(np.int64)
    lfidx_size = 1
    for t in vd.nb_lf_thr:
        lfidx_size *= t + 1
    bctx0 = qf * lfidx_size + lf  # order_idx == 0 for DCT8
    bctxc = 13 * (vd.nb_qf_thr + 1) * lfidx_size
    bmap = np.asarray(vd.block_ctx_map, np.int64)
    b3 = (bmap[bctx0] | (bmap[bctx0 + bctxc] << 10)
          | (bmap[bctx0 + 2 * bctxc] << 20))
    return b3.ravel().astype(np.int32)


def _decode_hf_batch(dec, state, vd, spec, lanes, orders_yxb,
                     resident_ok, full_cover, ctx_mode: bool = False) -> int:
    """Decode one <=128-lane batch; returns 0 on host fallback, else
    1 + number of LF groups kept device-resident."""
    from . import pallas_hf as ph
    from ..io.bits import BitReader

    streams = [(ln.data, ln.bitoff) for ln in lanes]
    ncells = [ln.gw8 * ln.gh8 for ln in lanes]
    ncells_max = int(max(ncells))
    lane_off = {id(ln): li for li, ln in enumerate(lanes)}
    by_gg: dict[int, list] = {}
    for ln in lanes:
        by_gg.setdefault(ln.ggidx, []).append(ln)
    res_ggs = [g for g in by_gg
               if resident_ok and full_cover.get(g)]

    if ctx_mode:
        bctx3 = [_lane_bctx3(vd, ln) for ln in lanes]
        ctxoffs = []
        for ln in lanes:
            r = BitReader(ln.data)
            preset = r.u(ln.bitoff) if ln.bitoff else 0
            ctxoffs.append(495 * vd.nb_block_ctx * preset)
        gw8s = [ln.gw8 for ln in lanes]
        try:
            coeffs_dev, st = ph.decode_hf_ctx(
                streams, ncells, spec, orders_yxb, bctx3, gw8s, ctxoffs,
                vd.nb_block_ctx, ncells_max)
        except ValueError:
            return 0  # stream too long for the whole-stream ctx kernel
    else:
        h = ph.launch_hf_multi_async(
            [(streams, list(ncells), spec, orders_yxb)], ncells_max)
        # OPTIMISTIC: dispatch the resident reconstructions from the
        # first attempt's planes BEFORE any host sync — the snapshot
        # fetch then overlaps the reconstruction kernels instead of
        # serializing a tunnel round-trip ahead of them
        coeffs_dev = ph.peek_hf_multi(h)
        for ggidx in res_ggs:
            _reconstruct_resident(vd, ggidx, by_gg[ggidx], lane_off,
                                  coeffs_dev)
        coeffs_fin, st_arr = ph.finish_hf_multi(h)
        stn = np.asarray(st_arr)
        L = len(lanes)
        st = {"ans_state": stn[0, :L].astype(np.uint32),
              "bitpos": stn[1, :L], "err": stn[6, :L],
              "done": stn[7, :L]}
        if h["resumed"]:
            # the peeked planes were incomplete: redo from the final ones
            coeffs_dev = coeffs_fin
            for ggidx in res_ggs:
                _reconstruct_resident(vd, ggidx, by_gg[ggidx], lane_off,
                                      coeffs_dev)

    if not st["done"].all():
        # step budget exhausted (pathological stream density): leave the
        # whole batch for the host path, which has no budget — and drop
        # any optimistic predispatched planes so the host reconstruction
        # is the one consumed
        if not ctx_mode:
            with vd._dispatch_lock:
                for ggidx in res_ggs:
                    vd._predispatched.pop(ggidx, None)
        return 0
    for li, ln in enumerate(lanes):
        check(int(st["err"][li]) == 0, "coef")
        base = (ln.bitoff // 8) & ~1
        _check_lane_end(ln, base * 8 + int(st["bitpos"][li]),
                        spec.use_prefix_code, int(st["ans_state"][li]))

    nres = 0
    host_lanes = []
    for ggidx, glanes in by_gg.items():
        if ggidx in res_ggs:
            if ctx_mode:
                _reconstruct_resident(vd, ggidx, glanes, lane_off,
                                      coeffs_dev)
            nres += 1
        else:
            host_lanes.extend(glanes)

    if host_lanes:
        dense = np.asarray(coeffs_dev)  # (L, 3, ncells_max, 64)
        pos64 = np.arange(64)
        for ln in host_lanes:
            li = lane_off[id(ln)]
            gg = ln.gg
            sub = gg.blocks[ln.gy8:ln.gy8 + ln.gh8,
                            ln.gx8:ln.gx8 + ln.gw8].ravel()
            offs = gg.vb_coeffoff[sub & 0xFFFFF].astype(np.int64)
            idx = offs[:, None] + pos64[None, :]
            n = ln.gw8 * ln.gh8
            for c in range(3):
                gg.coeffs[c][idx.ravel()] += dense[li, c, :n].ravel()
    return 1 + nres


def _reconstruct_resident(vd, ggidx, glanes, lane_off, coeffs_dev) -> None:
    """Assemble one fully-device-decoded LF group's (3, n, 64) plane from
    the kernel's dense output and run the fused dequant+CfL+IDCT+XYB
    reconstruction, all on device; the result enters vardct._predispatched
    under the same contract combine_lf_group_jax_async fulfills (same
    kernel, so backend="device" output is bit-identical to backend="jax")."""
    import jax.numpy as jnp

    from ..vardct.tables import DCT_SELECT
    from .combine_jax import _pack_consts22, _plan_aux_dct8, _cached_device
    from .pallas_kernels import reconstruct_dct8_srgb_pallas

    gg = glanes[0].gg
    f, im = vd.fs.f, vd.fs.im
    h8, w8 = gg.height8, gg.width8
    lane_b = np.empty(h8 * w8, np.int32)
    cell_b = np.empty(h8 * w8, np.int32)
    for ln in glanes:
        ys = np.arange(ln.gy8, ln.gy8 + ln.gh8)
        xs = np.arange(ln.gx8, ln.gx8 + ln.gw8)
        bb = (ys[:, None] * w8 + xs[None, :]).ravel()
        lane_b[bb] = lane_off[id(ln)]
        cell_b[bb] = np.arange(ln.gh8 * ln.gw8)
    blocks_arr = np.asarray(gg.blocks)
    voffs = (blocks_arr & 0xFFFFF).reshape(-1)
    offs = np.asarray(gg.vb_coeffoff)[voffs]
    aux, weights, consts22 = _plan_aux_dct8(vd, gg, im, f, voffs, offs)

    img = coeffs_dev[jnp.asarray(lane_b), :, jnp.asarray(cell_b), :]
    coeffs = img.transpose(1, 0, 2)  # (3, n, 64) f32, device-resident
    srgb = reconstruct_dct8_srgb_pallas(
        coeffs, jnp.asarray(aux[0:3]), jnp.asarray(aux[3]),
        jnp.asarray(aux[4]), jnp.asarray(aux[5]),
        _cached_device(("w", DCT_SELECT[0][2]), weights),
        _cached_device(("pc22",), consts22), h8, w8)
    if im.bpp == 8:
        out = jnp.clip(srgb, 0, 255).astype(jnp.uint8)
    else:
        out = srgb
    with vd._dispatch_lock:
        vd._predispatched[ggidx] = (out, gg.height, gg.width)
