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
    hybrid_luts,
    pack_streams,
    prefix_lut,
    reconstruct_channel,
    spec_is_device_simple,
    unpack_signed_dev,
)

INT16_MIN, INT16_MAX = -0x8000, 0x7FFF


class _Lane:
    __slots__ = ("section", "data", "bitoff", "picks", "nsym", "leaf", "spec")

    def __init__(self, section, data, bitoff, picks, leaf, spec):
        self.section = section
        self.data = data
        self.bitoff = bitoff
        self.picks = picks
        self.nsym = sum(w * h for (_, _, _, w, h) in picks)
        self.leaf = leaf
        self.spec = spec


def _prepare_lane(dec, state, s):
    """Host-parse one section's modular header; None when the section needs
    the host path (branchy tree, transforms, LZ77...) or decodes nothing."""
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
    if not leaf.is_leaf or leaf.predictor not in (0, 1, 2, 5):
        return None
    if not spec_is_device_simple(sub.codespec):
        return None
    return _Lane(s, data, r.bits_consumed, picks, leaf, sub.codespec)


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


def _decode_lane_batch(dec, gm, lanes, use_prefix: bool) -> None:
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
            tuple((w, h) for (_, _, _, w, h) in ln.picks),
        )
        classes.setdefault(key, []).append(li)

    pending = []  # (lane indices, pick slot, device plane batch, bad flag)
    for (predictor, mult, offset, shapes), lis in classes.items():
        rows = jnp.asarray(np.asarray(lis, np.int32))
        off = 0
        for slot, (w, h) in enumerate(shapes):
            seg = vals[rows, off : off + w * h]
            res = unpack_signed_dev(seg)
            if mult != 1:
                res = res * mult
            if offset != 0:
                res = res + offset
            rec = reconstruct_channel(
                res.reshape(len(lis), h, w), predictor, h, w
            )
            if gm.wide:
                bad = jnp.zeros((), jnp.bool_)
            else:
                bad = jnp.any((rec < INT16_MIN) | (rec > INT16_MAX))
                rec = rec.astype(jnp.int16)
            pending.append((lis, slot, rec, bad))
            off += w * h

    # one batched fetch (device->host transfers are the expensive part)
    fetched = jax.device_get(
        [p[2] for p in pending] + [p[3] for p in pending] + [fstates, bitpos]
    )
    planes, bads = fetched[: len(pending)], fetched[len(pending) : 2 * len(pending)]
    fstates_h, bitpos_h = fetched[-2], fetched[-1]
    t_fetch = time.perf_counter()

    # --- validation + writeback -------------------------------------------
    for li, ln in enumerate(lanes):
        base = (ln.bitoff // 8) & ~1
        _check_lane_end(ln, base * 8 + int(bitpos_h[li]), use_prefix,
                        int(fstates_h[li]))
    for (lis, slot, _, _), plane, bad in zip(pending, planes, bads):
        check(not bool(bad), "povf", "modular sample overflows int16 range")
        for k, li in enumerate(lis):
            gi, x0, y0, w, h = lanes[li].picks[slot]
            gm.channels[gi].data[y0 : y0 + h, x0 : x0 + w] = plane[k]

    stats = dec.stats.setdefault("device_modular", {})
    stats["kernel"] = kernel
    stats["lanes"] = stats.get("lanes", 0) + L
    stats["tokens"] = stats.get("tokens", 0) + int(nsym.sum())
    stats["setup_s"] = stats.get("setup_s", 0.0) + (t_setup - t0)
    stats["scan_fetch_s"] = stats.get("scan_fetch_s", 0.0) + (t_fetch - t_setup)
    stats["write_s"] = stats.get("write_s", 0.0) + (time.perf_counter() - t_fetch)


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
        batch = [ln for ln in lanes if ln.spec.use_prefix_code == use_prefix]
        if batch:
            _decode_lane_batch(dec, gm, batch, use_prefix)
            out.extend(ln.section for ln in batch)
    return out
