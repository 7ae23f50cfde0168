"""Device-side lockstep decode of modular pass-group sections.

The TPU lossless path (BASELINE north star): the TOC gives every group an
independent byte range with a fresh entropy stream (reference j40.h:5527-5537,
7749-7776; design note j40.h:447), so eligible sections decode in SIMD
lockstep on the device — one vector lane per section — via
`ops.device_entropy`: a `lax.scan` token decoder (rANS alias / Brotli-prefix
LUTs + hybrid ints) followed by anti-diagonal wavefront prediction.  Host
work is reduced to the few header bits of each section.

Eligibility is per section (anything else falls back to the host C++ path
with identical results): the section's MA tree — local or global — is a
single leaf with predictor 0/1/2/5 (the fjxl-style streams; the analog of
the host fast path keyed at j40.h:4143-4154), its code spec is one cluster
with no LZ77 and bounded extra bits (`spec_is_device_simple`), and the
section carries no local transforms.  Lanes may have *different* trees and
code tables: the decode kernel takes per-lane LUTs.

Exactness: all integer; the decoded planes are bit-identical to the host
path (and dj40) — the stream-end and ANS-final-state checks
(j40.h:2884-2897, 2011-2016) are enforced per lane after the scan.
"""

from __future__ import annotations

import time

import numpy as np

from ..entropy.ans import ANS_INIT_STATE
from ..errors import check
from ..io.bits import BitReader
from ..modular.decode import Channel, ModularImage, parse_modular_header
from .device_entropy import (
    ans_luts,
    decode_tokens,
    decode_tokens_ctx,
    hybrid_luts,
    mixed_reconstruct,
    pack_streams,
    prefix_lut,
    reconstruct_channel,
    spec_is_device_multi,
    spec_is_device_simple,
    unpack_signed_dev,
    wp_reconstruct_ovf,
)

INT16_MIN, INT16_MAX = -0x8000, 0x7FFF

#: MA-tree properties computable before any sample decode (channel index,
#: stream index, y, x — decode.py:360-367 / j40.h:4046-4053); trees built
#: from ONLY these split the image into static regions, so the per-pixel
#: context walk vectorizes on the host and the lanes stay data-independent
STATIC_PROPS = (0, 1, 2, 3)


class _Lane:
    __slots__ = ("section", "data", "bitoff", "picks", "nsym", "leaf", "spec",
                 "ctx", "wp", "ntree")

    def __init__(self, section, data, bitoff, picks, leaf, spec, ctx=None,
                 wp=None, ntree=None):
        self.section = section
        self.data = data
        self.bitoff = bitoff
        self.picks = picks
        self.nsym = sum(w * h for (_, _, _, w, h) in picks)
        self.leaf = leaf
        self.spec = spec
        #: multi-node static-property lanes: per-slot dict of per-pixel
        #: (cluster, predictor, offset, multiplier) planes from the
        #: vectorized tree walk (None for the single-leaf fast path)
        self.ctx = ctx
        #: WPParams when any leaf uses the self-correcting predictor (the
        #: WP wavefront needs them); None otherwise
        self.wp = wp
        #: NEIGHBOR-property tree payload (r5): hashable flattened tree
        #: for the in-wavefront walk (_tree_wp_reconstruct) + the lane's
        #: stream index; set only when the tree tests properties 4-15
        self.ntree = ntree


def _static_tree_walk(tree, cidx: int, sidx: int, h: int, w: int) -> np.ndarray:
    """Vectorized MA-tree walk over a (h, w) grid for STATIC_PROPS-only
    trees: every pixel descends the flattened node table simultaneously
    (property gathers, no per-pixel Python).  Returns per-pixel leaf node
    indices (host analog: decode.py:355-389, branch rule `val > node.value`
    -> left)."""
    prop = np.asarray([n.prop for n in tree], np.int32)
    value = np.asarray([n.value for n in tree], np.int32)
    left = np.asarray([n.left for n in tree], np.int32)
    right = np.asarray([n.right for n in tree], np.int32)
    yg, xg = np.mgrid[0:h, 0:w]
    yg = yg.astype(np.int32)
    xg = xg.astype(np.int32)
    node = np.zeros((h, w), np.int32)
    while True:
        p = prop[node]
        leafm = p < 0
        if leafm.all():
            return node
        v = np.select(
            [p == 0, p == 1, p == 2, p == 3],
            [np.full((h, w), cidx, np.int32),
             np.full((h, w), sidx, np.int32), yg, xg],
        )
        nxt = np.where(v > value[node], left[node], right[node])
        node = np.where(leafm, node, nxt)


def _prepare_lane(dec, state, s):
    """Host-parse one section's modular header; None when the section needs
    the host path (neighbor-dependent tree properties, transforms, LZ77...)
    or decodes nothing."""
    data = dec.src.read(s.codeoff, s.size)
    region = state._group_region(s.idx)
    picks = state.modular_picks(region, 0, 3)
    if not picks:
        return None
    gm = state.gmodular
    sub = ModularImage(
        channels=[Channel(w, h) for (_, _, _, w, h) in picks], wide=gm.wide
    )
    r = BitReader(data)
    parse_modular_header(
        r, sub, state.global_tree, state.global_codespec, state.limits
    )
    if sub.transforms:
        return None
    leaf = sub.tree[0]
    if leaf.is_leaf:
        if leaf.predictor == 6 and not gm.wide:
            # self-correcting predictor: WP wavefront (int32-exact only for
            # int16-range samples — wide streams stay on the host)
            if not spec_is_device_simple(sub.codespec):
                return None
            return _Lane(s, data, r.bits_consumed, picks, leaf, sub.codespec,
                         wp=sub.wp_params)
        if leaf.predictor not in (0, 1, 2, 5):
            return None
        if not spec_is_device_simple(sub.codespec):
            return None
        return _Lane(s, data, r.bits_consumed, picks, leaf, sub.codespec)

    # multi-node tree: device-eligible when every branch tests a static
    # property and every leaf uses a wavefront predictor; trees with any
    # leaf outside the plain-wavefront set {0,1,2,5} route through the WP
    # wavefront, which orders every predictor but 13 (needs NEE) and is
    # int32-exact only for int16-range samples
    needs_wp = False
    neighbor_props = False
    for n in sub.tree:
        if n.is_leaf:
            if n.predictor not in (0, 1, 2, 5):
                if n.predictor == 13 or gm.wide:
                    return None
                needs_wp = True
        elif n.prop not in STATIC_PROPS:
            if 4 <= n.prop <= 15 and not gm.wide:
                neighbor_props = True
            else:
                return None  # cross-channel refs (>= 16) stay host-only
    if neighbor_props:
        # NEIGHBOR-property tree (cjxl -e3 shape, j40.h:4177-4218): with a
        # single-cluster spec the token sequence is context-free, so
        # tokens decode at full device speed and the tree walk runs
        # inside the WP wavefront (ops/device_entropy.py
        # _tree_wp_reconstruct).  Multi-cluster neighbor trees would
        # serialize entropy decode per pixel -> host path.
        if not spec_is_device_simple(sub.codespec):
            return None
        tree_key = tuple(
            (-1, 0, 0, 0, n.predictor, n.offset, n.multiplier)
            if n.is_leaf else
            (n.prop, n.value, n.left, n.right, 0, 0, 0)
            for n in sub.tree)
        sidx = (1 + 3 * state.f.num_lf_groups + 17
                + s.pass_ * state.f.num_groups + s.idx)
        return _Lane(s, data, r.bits_consumed, picks, sub.tree[0],
                     sub.codespec, wp=sub.wp_params,
                     ntree=(tree_key, sidx))
    if not spec_is_device_multi(sub.codespec):
        return None
    cmap = np.asarray(sub.codespec.cluster_map, np.int32)
    ctxs = np.asarray([n.ctx for n in sub.tree], np.int32)
    preds = np.asarray([n.predictor for n in sub.tree], np.int32)
    offs = np.asarray([n.offset for n in sub.tree], np.int32)
    mults = np.asarray([n.multiplier for n in sub.tree], np.int32)
    # pass-group stream index (MA property 1), frame_state.py:146 rule
    sidx = (1 + 3 * state.f.num_lf_groups + 17
            + s.pass_ * state.f.num_groups + s.idx)
    slots = []
    for ci, (_, _, _, w, h) in enumerate(picks):
        nodes = _static_tree_walk(sub.tree, ci, sidx, h, w)
        slots.append({
            "cluster": cmap[ctxs[nodes]],
            "pred": preds[nodes],
            "offset": offs[nodes],
            "mult": mults[nodes],
        })
    return _Lane(s, data, r.bits_consumed, picks, leaf, sub.codespec,
                 ctx=slots, wp=sub.wp_params if needs_wp else None)


def _check_lane_end(lane, absbits: int, use_prefix: bool, fstate: int) -> None:
    """Per-lane stream-end validation (j40.h:2011-2016 + 2884-2897)."""
    if not use_prefix:
        check(fstate == ANS_INIT_STATE, "ans?")
    q, rbits = divmod(absbits, 8)
    nbytes = q + (1 if rbits else 0)
    check(nbytes <= len(lane.data), "shrt")
    if rbits:
        check(lane.data[q] >> rbits == 0, "pad0", "nonzero padding bits")
    check(nbytes == len(lane.data), "excs", "trailing data in section")


def _decode_lane_batch(dec, gm, lanes, use_prefix: bool):
    """Lockstep-decode one same-coder batch of lanes and write the planes."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    streams = [(ln.data, ln.bitoff) for ln in lanes]
    nsym = np.asarray([ln.nsym for ln in lanes], np.int32)
    n_steps = int(nsym.max())
    L = len(lanes)

    # Fast path: all lanes share one code spec (the usual case — sections
    # decode against the global spec) -> the Pallas in-kernel symbol loop
    # (ops/pallas_entropy.py, ~1 Gsym/s marginal on v5e vs ~3 Msym/s for
    # the lax.scan lockstep decoder it replaces).
    from . import pallas_entropy as pe
    from .pallas_kernels import pallas_available

    spec0 = lanes[0].spec
    shared = (
        pallas_available()
        and all(ln.spec is spec0 for ln in lanes)
        and pe.spec_is_pallas_simple(spec0)
    )
    if shared:
        t_setup = time.perf_counter()
        vals, fstates, bitpos = pe.decode_tokens_pallas(
            streams, nsym, spec0, n_steps)
        kernel = "pallas"
    else:
        words, skips = pack_streams(streams)
        sym_l, fb_l, mb_l, a_l, lo_l, lsb_l = [], [], [], [], [], []
        for ln in lanes:
            cl = ln.spec.clusters[0]
            if use_prefix:
                sym_l.append(prefix_lut(cl.prefix))
                fb_l.append(np.zeros(1, np.int32))
                alpha = 1 << 15
            else:
                fb, sym = ans_luts(cl)
                sym_l.append(sym)
                fb_l.append(fb)
                alpha = 1 << ln.spec.log_alpha_size
            mb, a_, lo = hybrid_luts(cl.config, alpha)
            mb_l.append(mb)
            a_l.append(a_)
            lo_l.append(lo)
            lsb_l.append(cl.config.lsb_in_token)
        amax = max(a.shape[0] for a in mb_l)
        pad = lambda arrs: np.stack(
            [np.pad(a, (0, amax - a.shape[0])) for a in arrs]
        )
        t_setup = time.perf_counter()

        vals, fstates, bitpos = decode_tokens(
            words, skips, nsym, np.stack(sym_l), np.stack(fb_l),
            pad(mb_l), pad(a_l), pad(lo_l), np.asarray(lsb_l, np.int32),
            n_steps=n_steps, use_prefix=use_prefix,
        )
        kernel = "scan"

    # --- per-shape-class wavefront reconstruction -------------------------
    classes: dict[tuple, list[int]] = {}
    for li, ln in enumerate(lanes):
        key = (
            ln.leaf.predictor, ln.leaf.multiplier, ln.leaf.offset,
            tuple((w, h) for (_, _, _, w, h) in ln.picks), ln.wp,
        )
        classes.setdefault(key, []).append(li)

    pending = []  # (lane indices, pick slot, device plane batch, bad flag)
    for (predictor, mult, offset, shapes, wp_params), lis in classes.items():
        rows = jnp.asarray(np.asarray(lis, np.int32))
        off = 0
        for slot, (w, h) in enumerate(shapes):
            seg = vals[rows, off : off + w * h]
            res = unpack_signed_dev(seg)
            if mult != 1:
                res = res * mult
            if offset != 0:
                res = res + offset
            if predictor == 6:
                rec, ovf = wp_reconstruct_ovf(
                    res.reshape(len(lis), h, w), None, h, w, wp_params
                )
            else:
                rec = reconstruct_channel(
                    res.reshape(len(lis), h, w), predictor, h, w
                )
                ovf = jnp.zeros((len(lis),), jnp.bool_)
            if gm.wide:
                bad = jnp.zeros((len(lis),), jnp.bool_)
            else:
                bad = jnp.any((rec < INT16_MIN) | (rec > INT16_MAX),
                              axis=(1, 2))
                rec = rec.astype(jnp.int16)
            pending.append((lis, slot, rec, bad, ovf))
            off += w * h

    # one batched fetch (device->host transfers are the expensive part)
    fetched = jax.device_get(
        [p[2] for p in pending] + [p[3] for p in pending]
        + [p[4] for p in pending] + [fstates, bitpos]
    )
    planes = fetched[: len(pending)]
    bads = fetched[len(pending) : 2 * len(pending)]
    ovfs = fetched[2 * len(pending) : 3 * len(pending)]
    fstates_h, bitpos_h = fetched[-2], fetched[-1]
    t_fetch = time.perf_counter()

    # WP error-state overflow sentinel (ops/device_entropy.py): affected
    # lanes are NOT written or validated here — the caller leaves their
    # sections to the host path, which decodes them with full-width math
    failed = {li for (lis, _, _, _, _), ovf in zip(pending, ovfs)
              for k, li in enumerate(lis) if bool(ovf[k])}

    # --- validation + writeback -------------------------------------------
    for li, ln in enumerate(lanes):
        if li in failed:
            continue
        base = (ln.bitoff // 8) & ~1
        _check_lane_end(ln, base * 8 + int(bitpos_h[li]), use_prefix,
                        int(fstates_h[li]))
    for (lis, slot, _, _, _), plane, bad in zip(pending, planes, bads):
        for k, li in enumerate(lis):
            if li in failed:
                continue
            check(not bool(bad[k]), "povf",
                  "modular sample overflows int16 range")
            gi, x0, y0, w, h = lanes[li].picks[slot]
            gm.channels[gi].data[y0 : y0 + h, x0 : x0 + w] = plane[k]

    stats = dec.stats.setdefault("device_modular", {})
    stats["kernel"] = kernel
    stats["lanes"] = stats.get("lanes", 0) + L
    stats["tokens"] = stats.get("tokens", 0) + int(nsym.sum())
    stats["setup_s"] = stats.get("setup_s", 0.0) + (t_setup - t0)
    stats["scan_fetch_s"] = stats.get("scan_fetch_s", 0.0) + (t_fetch - t_setup)
    stats["write_s"] = stats.get("write_s", 0.0) + (time.perf_counter() - t_fetch)
    return [ln for li, ln in enumerate(lanes) if li not in failed]


def _decode_lane_batch_ctx(dec, gm, lanes, use_prefix: bool):
    """Lockstep-decode multi-context (static-property MA tree) lanes.

    Same pipeline as `_decode_lane_batch` with two generalizations:
    per-TOKEN cluster ids select the LUT block inside the scan
    (`decode_tokens_ctx`), and reconstruction uses the per-PIXEL predictor
    wavefront (`mixed_reconstruct`) with per-pixel offset/multiplier."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    streams = [(ln.data, ln.bitoff) for ln in lanes]
    nsym = np.asarray([ln.nsym for ln in lanes], np.int32)
    n_steps = int(nsym.max())
    L = len(lanes)
    unroll = 4
    n_padded = -(-n_steps // unroll) * unroll

    words, skips = pack_streams(streams)
    cmax = max(ln.spec.num_clusters for ln in lanes)
    sym_l, fb_l, mb_l, a_l, lo_l, lsb_l, cid_l = [], [], [], [], [], [], []
    sym_w = (1 << 15) if use_prefix else 4096
    amax = 0
    hyb = []
    for ln in lanes:
        alpha = (1 << 15) if use_prefix else (1 << ln.spec.log_alpha_size)
        per = [hybrid_luts(cl.config, alpha) for cl in ln.spec.clusters]
        hyb.append(per)
        amax = max(amax, max(p[0].shape[0] for p in per))
    for ln, per in zip(lanes, hyb):
        C = ln.spec.num_clusters
        sym = np.zeros((cmax, sym_w), np.int32)
        fb = np.zeros((cmax, 4096 if not use_prefix else 1), np.int32)
        mb = np.zeros((cmax, amax), np.int32)
        a_ = np.zeros((cmax, amax), np.int32)
        lo = np.zeros((cmax, amax), np.int32)
        lsbv = np.zeros(cmax, np.int32)
        for c, cl in enumerate(ln.spec.clusters):
            if use_prefix:
                sym[c] = prefix_lut(cl.prefix)
            else:
                fb[c], sym[c] = ans_luts(cl)
            pmb, pa, plo = per[c]
            mb[c, : pmb.shape[0]] = pmb
            a_[c, : pa.shape[0]] = pa
            lo[c, : plo.shape[0]] = plo
            lsbv[c] = cl.config.lsb_in_token
        sym_l.append(sym.reshape(-1))
        fb_l.append(fb.reshape(-1))
        mb_l.append(mb.reshape(-1))
        a_l.append(a_.reshape(-1))
        lo_l.append(lo.reshape(-1))
        lsb_l.append(lsbv)
        cids = np.zeros(n_padded, np.int32)
        cids[: ln.nsym] = np.concatenate(
            [slot["cluster"].ravel() for slot in ln.ctx])
        cid_l.append(cids)
    t_setup = time.perf_counter()

    vals, fstates, bitpos = decode_tokens_ctx(
        words, skips, nsym, np.stack(cid_l), np.stack(sym_l), np.stack(fb_l),
        np.stack(mb_l), np.stack(a_l), np.stack(lo_l), np.stack(lsb_l),
        n_steps=n_steps, use_prefix=use_prefix, unroll=unroll,
    )

    # --- per-shape-class reconstruction (per-pixel predictor wavefront) ---
    classes: dict[tuple, list[int]] = {}
    for li, ln in enumerate(lanes):
        key = (tuple((w, h) for (_, _, _, w, h) in ln.picks), ln.wp)
        classes.setdefault(key, []).append(li)

    pending = []
    for (shapes, wp_params), lis in classes.items():
        rows = jnp.asarray(np.asarray(lis, np.int32))
        off = 0
        for slot, (w, h) in enumerate(shapes):
            seg = vals[rows, off : off + w * h]
            res = unpack_signed_dev(seg)
            mult = np.stack([lanes[li].ctx[slot]["mult"] for li in lis])
            offp = np.stack([lanes[li].ctx[slot]["offset"] for li in lis])
            pred = np.stack([lanes[li].ctx[slot]["pred"] for li in lis])
            res = res.reshape(len(lis), h, w)
            if (mult != 1).any():
                res = res * jnp.asarray(mult)
            if offp.any():
                res = res + jnp.asarray(offp)
            # per-SLOT kernel choice: a tree may gate WP behind (say) a
            # channel-index branch, so only slots whose pred plane
            # actually contains a non-{0,1,2,5} code pay the
            # half-occupancy WP wavefront; the rest take the plain
            # anti-diagonal (or closed-form) reconstructions
            needs_wp = (wp_params is not None
                        and not np.isin(pred, (0, 1, 2, 5)).all())
            if needs_wp:
                rec, ovf = wp_reconstruct_ovf(
                    res, jnp.asarray(pred), h, w, wp_params)
            elif (pred != pred.flat[0]).any():
                rec = mixed_reconstruct(res, jnp.asarray(pred), h, w)
                ovf = jnp.zeros((len(lis),), jnp.bool_)
            else:
                rec = reconstruct_channel(res, int(pred.flat[0]), h, w)
                ovf = jnp.zeros((len(lis),), jnp.bool_)
            if gm.wide:
                bad = jnp.zeros((len(lis),), jnp.bool_)
            else:
                bad = jnp.any((rec < INT16_MIN) | (rec > INT16_MAX),
                              axis=(1, 2))
                rec = rec.astype(jnp.int16)
            pending.append((lis, slot, rec, bad, ovf))
            off += w * h

    fetched = jax.device_get(
        [p[2] for p in pending] + [p[3] for p in pending]
        + [p[4] for p in pending] + [fstates, bitpos]
    )
    planes = fetched[: len(pending)]
    bads = fetched[len(pending) : 2 * len(pending)]
    ovfs = fetched[2 * len(pending) : 3 * len(pending)]
    fstates_h, bitpos_h = fetched[-2], fetched[-1]
    t_fetch = time.perf_counter()

    failed = {li for (lis, _, _, _, _), ovf in zip(pending, ovfs)
              for k, li in enumerate(lis) if bool(ovf[k])}

    for li, ln in enumerate(lanes):
        if li in failed:
            continue
        base = (ln.bitoff // 8) & ~1
        _check_lane_end(ln, base * 8 + int(bitpos_h[li]), use_prefix,
                        int(fstates_h[li]))
    for (lis, slot, _, _, _), plane, bad in zip(pending, planes, bads):
        for k, li in enumerate(lis):
            if li in failed:
                continue
            check(not bool(bad[k]), "povf",
                  "modular sample overflows int16 range")
            gi, x0, y0, w, h = lanes[li].picks[slot]
            gm.channels[gi].data[y0 : y0 + h, x0 : x0 + w] = plane[k]

    stats = dec.stats.setdefault("device_modular", {})
    stats["kernel"] = "scan-ctx"
    stats["ctx_lanes"] = stats.get("ctx_lanes", 0) + L
    stats["tokens"] = stats.get("tokens", 0) + int(nsym.sum())
    stats["setup_s"] = stats.get("setup_s", 0.0) + (t_setup - t0)
    stats["scan_fetch_s"] = stats.get("scan_fetch_s", 0.0) + (t_fetch - t_setup)
    stats["write_s"] = stats.get("write_s", 0.0) + (time.perf_counter() - t_fetch)
    return [ln for li, ln in enumerate(lanes) if li not in failed]


def _decode_lane_batch_ntree(dec, gm, lanes, use_prefix: bool):
    """NEIGHBOR-property-tree lanes: tokens decode context-free (single
    cluster), then every pick slot reconstructs through the in-wavefront
    tree walk (ops/device_entropy.py _tree_wp_reconstruct) — per-pixel
    predictor/offset/multiplier from properties 0-15 evaluated on the
    d = 2y+x diagonals, bit-exact vs the host walk."""
    import jax
    import jax.numpy as jnp

    from .device_entropy import tree_wp_reconstruct

    t0 = time.perf_counter()
    streams = [(ln.data, ln.bitoff) for ln in lanes]
    nsym = np.asarray([ln.nsym for ln in lanes], np.int32)
    n_steps = int(nsym.max())
    L = len(lanes)

    from . import pallas_entropy as pe
    from .pallas_kernels import pallas_available

    spec0 = lanes[0].spec
    shared = (
        pallas_available()
        and all(ln.spec is spec0 for ln in lanes)
        and pe.spec_is_pallas_simple(spec0)
    )
    if shared:
        t_setup = time.perf_counter()
        vals, fstates, bitpos = pe.decode_tokens_pallas(
            streams, nsym, spec0, n_steps)
        kernel = "pallas"
    else:
        words, skips = pack_streams(streams)
        sym_l, fb_l, mb_l, a_l, lo_l, lsb_l = [], [], [], [], [], []
        for ln in lanes:
            cl = ln.spec.clusters[0]
            if use_prefix:
                sym_l.append(prefix_lut(cl.prefix))
                fb_l.append(np.zeros(1, np.int32))
                alpha = 1 << 15
            else:
                fb, sym = ans_luts(cl)
                sym_l.append(sym)
                fb_l.append(fb)
                alpha = 1 << ln.spec.log_alpha_size
            mb, a_, lo = hybrid_luts(cl.config, alpha)
            mb_l.append(mb)
            a_l.append(a_)
            lo_l.append(lo)
            lsb_l.append(cl.config.lsb_in_token)
        amax = max(a.shape[0] for a in mb_l)
        pad = lambda arrs: np.stack(
            [np.pad(a, (0, amax - a.shape[0])) for a in arrs]
        )
        t_setup = time.perf_counter()
        vals, fstates, bitpos = decode_tokens(
            words, skips, nsym, np.stack(sym_l), np.stack(fb_l),
            pad(mb_l), pad(a_l), pad(lo_l), np.asarray(lsb_l, np.int32),
            n_steps=n_steps, use_prefix=use_prefix,
        )
        kernel = "scan"
    vals = jnp.asarray(vals)

    # classes: one (tree, wp, shapes) program per slot; sidx per lane
    classes: dict[tuple, list[int]] = {}
    for li, ln in enumerate(lanes):
        key = (ln.ntree[0], ln.wp,
               tuple((w, h) for (_, _, _, w, h) in ln.picks))
        classes.setdefault(key, []).append(li)

    pending = []
    for (tree_key, wp_params, shapes), lis in classes.items():
        rows = jnp.asarray(np.asarray(lis, np.int32))
        sidx = np.asarray([lanes[li].ntree[1] for li in lis], np.int32)
        off = 0
        for slot, (w, h) in enumerate(shapes):
            seg = vals[rows, off : off + w * h]
            res = unpack_signed_dev(seg).reshape(len(lis), h, w)
            cidx = slot  # channel index = pick slot (RGB channels 0..2)
            rec, ovf = tree_wp_reconstruct(
                res, tree_key, cidx, sidx, h, w, wp_params)
            if gm.wide:
                bad = jnp.zeros((len(lis),), jnp.bool_)
            else:
                bad = jnp.any((rec < INT16_MIN) | (rec > INT16_MAX),
                              axis=(1, 2))
                rec = rec.astype(jnp.int16)
            pending.append((lis, slot, rec, bad, ovf))
            off += w * h

    fetched = jax.device_get(
        [p[2] for p in pending] + [p[3] for p in pending]
        + [p[4] for p in pending] + [fstates, bitpos]
    )
    planes = fetched[: len(pending)]
    bads = fetched[len(pending) : 2 * len(pending)]
    ovfs = fetched[2 * len(pending) : 3 * len(pending)]
    fstates_h, bitpos_h = fetched[-2], fetched[-1]
    t_fetch = time.perf_counter()

    failed = {li for (lis, _, _, _, _), ovf in zip(pending, ovfs)
              for k, li in enumerate(lis) if bool(ovf[k])}
    for li, ln in enumerate(lanes):
        if li in failed:
            continue
        base = (ln.bitoff // 8) & ~1
        _check_lane_end(ln, base * 8 + int(bitpos_h[li]), use_prefix,
                        int(fstates_h[li]))
    for (lis, slot, _, _, _), plane, bad in zip(pending, planes, bads):
        for k, li in enumerate(lis):
            if li in failed:
                continue
            check(not bool(bad[k]), "povf",
                  "modular sample overflows int16 range")
            gi, x0, y0, w, h = lanes[li].picks[slot]
            gm.channels[gi].data[y0 : y0 + h, x0 : x0 + w] = plane[k]

    stats = dec.stats.setdefault("device_modular", {})
    stats["kernel"] = f"{kernel}+tree-wavefront"
    stats["ntree_lanes"] = stats.get("ntree_lanes", 0) + L
    stats["tokens"] = stats.get("tokens", 0) + int(nsym.sum())
    stats["setup_s"] = stats.get("setup_s", 0.0) + (t_setup - t0)
    stats["scan_fetch_s"] = stats.get("scan_fetch_s", 0.0) + (t_fetch - t_setup)
    stats["write_s"] = stats.get("write_s", 0.0) + (time.perf_counter() - t_fetch)
    return [ln for li, ln in enumerate(lanes) if li not in failed]


def try_device_pass_groups(dec, state, f, sections) -> list:
    """Decode eligible modular pass-group sections on device, write their
    planes into the gmodular image, and return the sections decoded.

    Ineligible sections are skipped and left for the host path."""
    if not sections or state.gmodular is None:
        return []
    lanes = [ln for s in sections if (ln := _prepare_lane(dec, state, s))]
    if not lanes:
        return []
    gm = state.gmodular
    out = []
    for use_prefix in (True, False):
        batch = [ln for ln in lanes
                 if ln.spec.use_prefix_code == use_prefix
                 and ln.ctx is None and ln.ntree is None]
        if batch:
            ok = _decode_lane_batch(dec, gm, batch, use_prefix)
            out.extend(ln.section for ln in ok)
        cbatch = [ln for ln in lanes
                  if ln.spec.use_prefix_code == use_prefix
                  and ln.ctx is not None]
        if cbatch:
            ok = _decode_lane_batch_ctx(dec, gm, cbatch, use_prefix)
            out.extend(ln.section for ln in ok)
        nbatch = [ln for ln in lanes
                  if ln.spec.use_prefix_code == use_prefix
                  and ln.ntree is not None]
        if nbatch:
            ok = _decode_lane_batch_ntree(dec, gm, nbatch, use_prefix)
            out.extend(ln.section for ln in ok)
    return out
