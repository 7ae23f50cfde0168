"""Per-shard on-device entropy decode inside the sharded program.

The north-star sentence — "entropy decode ... run as a Pallas per-group
decode loop (256x256 groups sharded across chips)" — as a runnable
program: the TOC scatters each section's raw BYTES to its owner shard
(reference j40.h:5527-5537; per-section stream isolation j40.h:447,
7749-7776), and each shard entropy-decodes its own sections' token
streams ON ITS DEVICE inside one `shard_map`, then reconstructs its
share of the image planes in the same program.  No host entropy stage:
host work is headers + the byte scatter.

Two in-shard decoder bodies with identical semantics:

- ``use_pallas=True``: the Pallas symbol-loop kernel
  (ops/pallas_entropy._decode_pallas) — the real-TPU configuration,
  measured single-chip by bench.py's `sharded_entropy` probe.
- ``use_pallas=False``: the `lax.scan` lockstep decoder
  (ops/device_entropy.decode_tokens) — the same per-lane stream walk as
  ordinary XLA ops, used on virtual CPU meshes where Pallas interpret
  mode is orders of magnitude too slow to execute
  (`__graft_entry__.dryrun_multichip` leg 5).  Both paths are bit-exact
  against the host decoder; the dryrun asserts it.

Eligibility (host falls back outside it): modular frame, >= 2 groups,
single-leaf gradient/W/N/zero tree, single-cluster LZ77-free ANS spec,
same-shape channel picks per section — the fjxl-style streams that are
the lossless serving shape.
"""

from __future__ import annotations

import numpy as np

from ..entropy.ans import ANS_INIT_STATE
from ..errors import check


def plan_sections(blob: bytes):
    """Host side: full reference decode (the parity oracle) + per-section
    lane extraction.  Returns (dec, lanes, spec, (gh, gw))."""
    from ..decode import Decoder
    from ..ops.device_modular import _prepare_lane

    d = Decoder(blob, backend="numpy")
    d.decode_frame(_defer_finish=True)
    f, toc, state = d._deferred
    if not f.is_modular:
        raise ValueError("sharded entropy leg needs a modular frame")
    sections = [s for s in toc.sections if s.pass_ >= 0]
    if len(sections) < 2:
        raise ValueError("needs a multi-group stream")
    lanes = []
    for s in sections:
        ln = _prepare_lane(d, state, s)
        if ln is None or ln.ctx is not None or ln.wp is not None:
            raise ValueError("section not single-leaf device-simple")
        lanes.append(ln)
    shapes = {tuple(p[3:] for p in ln.picks) for ln in lanes}
    if len(shapes) != 1 or len(lanes[0].picks) != 3:
        raise ValueError("sections must share one 3-channel shape")
    (gw, gh), = {(p[3], p[4]) for ln in lanes for p in ln.picks}
    if any(ln.spec is not lanes[0].spec for ln in lanes[1:]):
        # per-section LOCAL trees quantize their own histograms: the
        # shared-LUT shard program needs the global-tree emission
        raise ValueError("sections must share the global code spec")
    return d, lanes, lanes[0].spec, (gh, gw)


import functools


@functools.lru_cache(maxsize=16)
def _compiled(mesh, axis, use_pallas: bool, segmented: bool, win: int,
              nsym_per: int, gh: int, gw: int, predictor: int, lsb: int,
              k_syms: int):
    """Compile-once cache of the sharded decode program (keyed on every
    static shape/flag; table contents are runtime args)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops import pallas_entropy as pe
    from ..ops.device_entropy import (decode_tokens, reconstruct_channel,
                                      unpack_signed_dev)

    def body(words_s, nsym_s, skips_s, init3_s, sym_t, fb_t, mb_t, a_t,
             lo_t, lut_c, tok_c, lsb_c):
        s = words_s.shape[0]
        if use_pallas:
            init = jnp.zeros((3, pe.LANE), jnp.int32)
            init = init.at[:, :s].set(init3_s.T)
            ns = jnp.zeros((1, pe.LANE), jnp.int32)
            ns = ns.at[0, :s].set(nsym_s)
            common = dict(n_steps=nsym_per, use_prefix=False,
                          prefix_width=0)
            if segmented:
                vals, st = pe._decode_pallas_long(
                    words_s.astype(jnp.uint16), init, ns, lut_c, tok_c,
                    lsb_c, k_syms=k_syms, wseg=win, **common)
            else:
                vals, st = pe._decode_pallas(
                    words_s.astype(jnp.uint16), init, ns, lut_c, tok_c,
                    lsb_c, wrows=win, **common)
            vals = vals[:nsym_per, :s].T                  # (s, nsym)
            fstate = st[0, :s]
        else:
            bl = lambda t: jnp.broadcast_to(t[None], (s,) + t.shape)
            vals, fstate, _ = decode_tokens(
                jax.lax.bitcast_convert_type(words_s, jnp.uint32),
                skips_s, nsym_s,
                bl(sym_t), bl(fb_t), bl(mb_t), bl(a_t), bl(lo_t),
                jnp.full((s,), lsb, jnp.int32),
                n_steps=nsym_per, use_prefix=False)
            fstate = fstate.astype(jnp.int32)
        res = unpack_signed_dev(vals).reshape(s * 3, gh, gw)
        rec = reconstruct_channel(res, predictor, gh, gw)
        return rec.reshape(s, 3, gh, gw), fstate

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)) + (P(),) * 8,
        out_specs=(P(axis), P(axis)),
        # the pallas_call's out_shape structs carry no vma annotation
        **({"check_rep": False} if use_pallas else {}))
    return jax.jit(fn)


def decode_modular_sections_sharded(blob: bytes, mesh, axis: str = "rows",
                                    use_pallas: bool = False):
    """Decode a multi-group modular stream with PER-SHARD on-device
    entropy decode; returns (planes (S, 3, gh, gw) int32, reference
    decoder).  Bit-exact vs the host decode (asserted by the caller
    against ``reference``'s gmodular planes)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops import pallas_entropy as pe
    from ..ops.device_entropy import (ans_luts, decode_tokens, hybrid_luts,
                                      pack_streams, reconstruct_channel,
                                      unpack_signed_dev)

    dec, lanes, spec, (gh, gw) = plan_sections(blob)
    S = len(lanes)
    n_shards = mesh.shape[axis]
    S_pad = -(-S // n_shards) * n_shards
    predictor = lanes[0].leaf.predictor
    nsym_per = 3 * gh * gw

    streams = [(ln.data, ln.bitoff) for ln in lanes]
    words_lw, skips = pack_streams(streams)          # (S, w16) uint32
    w16 = words_lw.shape[1]
    words = np.zeros((S_pad, w16), np.int32)
    words[:S] = words_lw.astype(np.int64).astype(np.int32)
    nsym = np.zeros(S_pad, np.int32)
    nsym[:S] = nsym_per
    skips_p = np.zeros(S_pad, np.int32)
    skips_p[:S] = skips

    cl = spec.clusters[0]
    fb, sym = ans_luts(cl)
    alpha = 1 << spec.log_alpha_size
    mb, A, lo = hybrid_luts(cl.config, alpha)
    lsb = cl.config.lsb_in_token

    if use_pallas:
        segmented = not pe.streams_fit_pallas(streams)
        k_syms = pe.LONG_K_SYMS
        inp = pe.build_lane_inputs(streams, spec, segmented=segmented,
                                   k_syms=k_syms)
        init3 = np.zeros((S_pad, 3), np.int32)
        init3[:S] = inp["init"][:3, :S].T
        lut_c = jnp.asarray(inp["lut"])
        tok_c = jnp.asarray(inp["tok"])
        lsb_c = jnp.asarray(inp["lsb"])
        n_steps = nsym_per
    else:
        init3 = np.zeros((S_pad, 3), np.int32)

    sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    dwords = jax.device_put(jnp.asarray(words), sh)
    dnsym = jax.device_put(jnp.asarray(nsym), sh)
    dskips = jax.device_put(jnp.asarray(skips_p), sh)
    dinit3 = jax.device_put(jnp.asarray(init3), sh)
    dsym = jax.device_put(jnp.asarray(sym), rep)
    dfb = jax.device_put(jnp.asarray(fb), rep)
    dmb = jax.device_put(jnp.asarray(mb), rep)
    dA = jax.device_put(jnp.asarray(A), rep)
    dlo = jax.device_put(jnp.asarray(lo), rep)

    if use_pallas:
        win = inp["wseg"] if segmented else inp["wrows"]
        dlut = jax.device_put(lut_c, rep)
        dtok = jax.device_put(tok_c, rep)
        dlsb = jax.device_put(lsb_c, rep)
    else:
        win = 0
        dlut = dtok = dlsb = jax.device_put(jnp.zeros((1,), jnp.int32),
                                            rep)
    fn = _compiled(mesh, axis, use_pallas,
                   segmented if use_pallas else False, win, nsym_per,
                   gh, gw, predictor, lsb,
                   pe.LONG_K_SYMS if use_pallas else 0)
    planes, fstates = fn(dwords, dnsym, dskips, dinit3, dsym, dfb,
                         dmb, dA, dlo, dlut, dtok, dlsb)
    planes = np.asarray(planes)[:S]
    fstates = np.asarray(fstates)[:S]
    for k in range(S):
        check(int(np.uint32(fstates[k])) == ANS_INIT_STATE, "ans?")
    return planes, lanes, dec
