"""Mesh-sharded lossless Modular decode: inverse transforms as device compute.

The host side scatters TOC sections to threads exactly as the single-device
decoder does (per-section isolation, j40.h:7752-7776) and stops *before*
the frame-level inverse transforms; the transform chain — Squeeze merges,
inverse RCT, clamp+pack render — then runs as one jitted program over a
device mesh (BASELINE config-2 shape: cjxl -e3 lossless = MA tree + RCT +
Squeeze; the reference stubs Squeeze at j40.h:4518, so parity is gated on
our spec oracle `modular.transforms`, which tests pin to hand-computed H.6
vectors).

Sharding story (the TPU-native part): each unsqueeze step is sequential
along its merge axis (SmoothTendency reads the previously reconstructed
neighbor, spec H.6.1) but embarrassingly parallel across the other axis.
A horizontal step therefore runs as a `lax.scan` over columns with rows
sharded; a vertical step scans rows with columns sharded.  Steps alternate,
so the program flips the sharded axis between them via
`with_sharding_constraint` — XLA GSPMD inserts the all-to-all
redistribution (the distributed-transpose pattern), keeping every scan
step's vector work local to its shard.

All arithmetic is int32 (exact in XLA); results are bit-identical to the
numpy oracle for any stream whose samples fit 16 bits (wide streams fall
back to the host path).
"""

from __future__ import annotations

import numpy as np

from ..errors import Unsupported, check
from ..modular.transforms import RCT_PERMUTATIONS, TR_RCT, TR_SQUEEZE


def _trunc_div(x, d: int):
    import jax.numpy as jnp

    q = jnp.abs(x) // d
    return jnp.where(x < 0, -q, q)


def _smooth_tendency(B, a, n):
    """SmoothTendency (spec H.6.1), branchless int32 (oracle:
    modular.transforms._smooth_tendency)."""
    import jax.numpy as jnp

    inc = (B >= a) & (a >= n)
    dec = (B <= a) & (a <= n) & ~inc

    d_inc = _trunc_div(4 * B - 3 * n - a + 6, 12)
    d_inc = jnp.where((d_inc - (d_inc & 1)) > 2 * (B - a), 2 * (B - a) + 1, d_inc)
    d_inc = jnp.where((d_inc + (d_inc & 1)) > 2 * (a - n), 2 * (a - n), d_inc)

    d_dec = _trunc_div(4 * B - 3 * n - a - 6, 12)
    d_dec = jnp.where((d_dec + (d_dec & 1)) < 2 * (B - a), 2 * (B - a) - 1, d_dec)
    d_dec = jnp.where((d_dec - (d_dec & 1)) < 2 * (a - n), 2 * (a - n), d_dec)

    return jnp.where(inc, d_inc, jnp.where(dec, d_dec, 0))


def _inv_squeeze_h_scan(down, residu):
    """Horizontal unsqueeze: scan over output column pairs, rows vectorized
    (bit-equal to modular.transforms._inv_squeeze_h in int32)."""
    import jax
    import jax.numpy as jnp

    h, wd = down.shape
    wr = residu.shape[1]
    w = wd + wr
    if wr == 0:
        return down
    # next_avg = down[:, x+1] (clamped to the last column when x+1 == wd)
    nxt = down[:, 1:] if wd > wr else jnp.concatenate(
        [down[:, 1:], down[:, -1:]], axis=1)
    nxt = nxt[:, :wr]
    xs = (
        jnp.swapaxes(down[:, :wr], 0, 1),
        jnp.swapaxes(nxt, 0, 1),
        jnp.swapaxes(residu, 0, 1),
        jnp.arange(wr, dtype=jnp.int32),
    )

    def step(left, inp):
        avg, nav, res, x = inp
        left = jnp.where(x == 0, avg, left)
        diff = res + _smooth_tendency(left, avg, nav)
        first = avg + _trunc_div(diff, 2)
        second = first - diff
        return second, (first, second)

    _, (firsts, seconds) = jax.lax.scan(step, jnp.zeros((h,), down.dtype), xs)
    # interleave via strided set-slices (lowers to interior padding), NOT
    # jnp.stack: the stack's concatenate-of-broadcasts is the op the SPMD
    # partitioner could only reshard by full rematerialization on the row
    # mesh (MULTICHIP r3 tail warnings)
    out = jnp.zeros((h, 2 * wr), down.dtype)
    out = out.at[:, 0::2].set(jnp.swapaxes(firsts, 0, 1))
    out = out.at[:, 1::2].set(jnp.swapaxes(seconds, 0, 1))
    if w & 1:
        out = jnp.concatenate([out, down[:, -1:]], axis=1)
    return out


def _device_finish_fn(transforms, meta, mesh, shard_axis, bpp):
    """Build the jitted transform+render program for one stream geometry.

    `transforms` is a static list of ("sq", begin_c, num_c, offset,
    horizontal) / ("rct", begin_c, rct_type) steps in inverse application
    order; `meta` is a static render descriptor: ncolor, alpha channel
    index (or None), do_ycbcr, and the output depth (8 or 16)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    ncolor = meta["ncolor"]
    alpha_idx = meta["alpha_idx"]
    ycbcr = meta["ycbcr"]
    depth = meta["depth"]

    rows = NamedSharding(mesh, P(shard_axis, None))
    cols = NamedSharding(mesh, P(None, shard_axis))

    def run(*planes):
        chans = list(planes)
        for t in transforms:
            if t[0] == "sq":
                _, begin_c, num_c, offset, horizontal = t
                for k in range(num_c):
                    c = chans[begin_c + k]
                    rc = chans[offset + k]
                    if horizontal:
                        c = jax.lax.with_sharding_constraint(c, rows)
                        rc = jax.lax.with_sharding_constraint(rc, rows)
                        merged = _inv_squeeze_h_scan(c, rc)
                    else:
                        c = jax.lax.with_sharding_constraint(c, cols)
                        rc = jax.lax.with_sharding_constraint(rc, cols)
                        merged = jnp.swapaxes(
                            _inv_squeeze_h_scan(
                                jnp.swapaxes(c, 0, 1), jnp.swapaxes(rc, 0, 1)
                            ), 0, 1)
                    chans[begin_c + k] = merged
                del chans[offset : offset + num_c]
            else:
                _, b, rct_type = t
                p0, p1, p2 = chans[b], chans[b + 1], chans[b + 2]
                tt = rct_type % 7
                if tt == 1:
                    p2 = p2 + p0
                elif tt == 2:
                    p2 = p1 + p0
                elif tt == 3:
                    p1 = p1 + p0
                    p2 = p2 + p0
                elif tt == 4:
                    p1 = p1 + ((p0 + p2) >> 1)
                elif tt == 5:
                    p1 = p1 + p0 + (p2 >> 1)
                    p2 = p2 + p0
                elif tt == 6:  # YCgCo
                    tmp = p0 - (p2 >> 1)
                    np1 = p2 + tmp
                    np2 = tmp - (p1 >> 1)
                    p0, p1, p2 = np2 + p1, np1, np2
                perm = RCT_PERMUTATIONS[rct_type // 7]
                out = [None] * 3
                for i, pl in enumerate((p0, p1, p2)):
                    out[perm[i]] = pl
                chans[b], chans[b + 1], chans[b + 2] = out
        # clamp + interleave render (j40.h:7910-7962), row-sharded output
        maxp = (1 << bpp) - 1
        omax = (1 << depth) - 1
        half = 1 << (bpp - 1)
        odt = jnp.uint8 if depth == 8 else jnp.uint16

        def to_depth(p):
            # host _render scale-to-depth semantics (decode.py::_render)
            if bpp == depth:
                return jnp.clip(p, 0, omax).astype(odt)
            p = jnp.clip(p, 0, maxp)
            return ((p * omax + half) // maxp).astype(odt)

        if ycbcr:
            # full-range BT.601 with the libjxl +128/255 luma offset;
            # channels are (Cb, Y, Cr) centered, chroma possibly 2x
            # subsampled (upsamples by replication).  Matches the host
            # render within 1 gray level (device f32 vs host f64 rounding).
            yy = jax.lax.with_sharding_constraint(chans[1], rows)
            h, w = yy.shape

            def up(p):
                if p.shape[0] != h:
                    p = jnp.repeat(p, 2, 0)[:h]
                if p.shape[1] != w:
                    p = jnp.repeat(p, 2, 1)[:, :w]
                return jax.lax.with_sharding_constraint(p, rows)

            inv = jnp.float32(1.0 / maxp)
            cb = up(chans[0]).astype(jnp.float32) * inv
            y = yy.astype(jnp.float32) * inv + jnp.float32(128.0 / 255.0)
            cr = up(chans[2]).astype(jnp.float32) * inv
            fm = jnp.float32(omax)
            rgbf = [
                (y + 1.402 * cr) * fm,
                (y - 0.344136 * cb - 0.714136 * cr) * fm,
                (y + 1.772 * cb) * fm,
            ]
            rgb = [jnp.clip(jnp.round(p), 0, omax).astype(odt) for p in rgbf]
        else:
            rgb = [to_depth(
                       jax.lax.with_sharding_constraint(
                           chans[min(i, ncolor - 1)], rows))
                   for i in range(3)]
        if alpha_idx is None:
            a = jnp.full_like(rgb[0], omax)
        else:
            a = to_depth(
                jax.lax.with_sharding_constraint(chans[alpha_idx], rows))
        return jnp.stack(rgb + [a], axis=-1)

    return jax.jit(run)


def decode_sharded_lossless(
    data: bytes,
    mesh=None,
    n_devices: int | None = None,
    owners: int | None = None,
    bit_depth: int = 8,
) -> np.ndarray:
    """Decode a lossless Modular .jxl across a device mesh; (H, W, 4) uint8
    (or uint16 with bit_depth=16, the U16X4 analog of api.output_format).

    Host threads entropy-decode the TOC sections (one owner chunk per mesh
    row); the Squeeze/RCT inverse-transform chain and the render run as one
    sharded device program.  Bit-exact vs the single-device Decoder
    (YCbCr frames: within 1 gray level — device f32 vs host f64 BT.601)."""
    import jax
    from jax.sharding import Mesh

    check(bit_depth in (8, 16), "fmt?", "bit_depth must be 8 or 16")
    if mesh is None:
        devs = jax.devices()[: (n_devices or len(jax.devices()))]
        mesh = Mesh(np.array(devs), ("rows",))
    shard_axis = mesh.axis_names[-1]
    n = mesh.shape[shard_axis]

    from ..decode import Decoder

    d = Decoder(data, backend="numpy", workers=owners or n)
    d.decode_frame(_defer_finish=True)  # sections done; transforms pending
    f, toc, state = d._deferred
    d._deferred = None
    gm = state.gmodular
    check(f.is_modular and state.vardct is None, "TODO",
          "sharded lossless: modular frames only")
    if d.image.bpp > 14 or gm.wide:
        raise Unsupported(message="sharded lossless: bpp > 14 (int32 margin)")
    # (gab/EPF flags are signaled but only apply to VarDCT sample frames)
    if f.log_upsampling:
        raise Unsupported(message="sharded lossless: upsampled frames")

    steps = []
    for tr in reversed(gm.transforms):
        if tr.id == TR_SQUEEZE:
            steps.append(("sq", tr.begin_c, tr.num_c, tr.offset,
                          bool(tr.horizontal)))
        elif tr.id == TR_RCT:
            steps.append(("rct", tr.begin_c, int(tr.rct_type)))
        else:
            raise Unsupported(
                message="sharded lossless: palette transform (host path)")
    for c in gm.channels:
        if c.empty:
            raise Unsupported(message="sharded lossless: empty channel")

    im = d.image
    ncolor = d._ncolor(f)
    alpha_idx = None
    # post-transform channel layout: ncolor color planes then the declared
    # extra channels (gm.channels still holds the pre-transform list here)
    for i, ec in enumerate(im.ec_info):
        if ec.type == 0:  # alpha
            alpha_idx = ncolor + i
            break
    if f.do_ycbcr and ncolor != 3:
        raise Unsupported(message="sharded lossless: ycbcr needs 3 channels")
    meta = {"ncolor": ncolor, "alpha_idx": alpha_idx,
            "ycbcr": bool(f.do_ycbcr), "depth": bit_depth}
    run = _device_finish_fn(tuple(steps), meta, mesh, shard_axis, im.bpp)
    planes = [np.ascontiguousarray(c.data, dtype=np.int32)
              for c in gm.channels]
    out = np.asarray(run(*planes))
    H, W = im.height, im.width
    return out[:H, :W]
