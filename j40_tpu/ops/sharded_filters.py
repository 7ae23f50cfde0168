"""Sharded whole-image restoration filtering with ICI halo exchange.

The per-LF-group filters (ops.filters) mirror at group borders, so a sharded
decode needs no communication.  This module provides the spec-faithful
alternative: the image is row-sharded across a device mesh and each 3x3
gaborish step exchanges one-row halos with mesh neighbors via
`jax.lax.ppermute` (ICI neighbor traffic — the ring-exchange pattern the
format's group topology maps to; SURVEY.md §2 "cross-group sequential
couplings").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def _gaborish_rows(tile, top_halo, bottom_halo, weights):
    """Filter one row-shard given 1-row halos from the neighbor shards."""
    outs = []
    for c in range(3):
        w1, w2 = weights[c]
        wsum = 1.0 + w1 * 4 + w2 * 4
        w0n, w1n, w2n = 1.0 / wsum, w1 / wsum, w2 / wsum
        # stack halo rows around the tile, then pad columns by edge replication
        ext = jnp.concatenate([top_halo[c][None], tile[c], bottom_halo[c][None]])
        p = jnp.pad(ext, ((0, 0), (1, 1)), mode="edge")
        outs.append(
            p[:-2, :-2] * w2n + p[:-2, 1:-1] * w1n + p[:-2, 2:] * w2n
            + p[1:-1, :-2] * w1n + p[1:-1, 1:-1] * w0n + p[1:-1, 2:] * w1n
            + p[2:, :-2] * w2n + p[2:, 1:-1] * w1n + p[2:, 2:] * w2n
        )
    return jnp.stack(outs)


def sharded_gaborish(channels: np.ndarray, weights, mesh: Mesh, axis: str = "rows"):
    """Whole-image gaborish over a row-sharded (3, H, W) array.

    Each shard sends its edge rows to its mesh neighbors with ppermute and
    receives the neighbor halos; outer image borders replicate (matching the
    unsharded reference layout in ops.filters.gaborish)."""
    n = mesh.devices.size

    def step(x):
        idx = jax.lax.axis_index(axis)
        # neighbor edge rows ride the ICI ring
        up_edge = x[:, 0, :]
        down_edge = x[:, -1, :]
        from_above = jax.lax.ppermute(
            down_edge, axis, [(i, i + 1) for i in range(n - 1)]
        )
        from_below = jax.lax.ppermute(
            up_edge, axis, [(i + 1, i) for i in range(n - 1)]
        )
        # outer borders: replicate own edge (mirror-of-size-1 == edge)
        top = jnp.where(idx == 0, up_edge, from_above)
        bottom = jnp.where(idx == n - 1, down_edge, from_below)
        return _gaborish_rows(x, top, bottom, weights)

    fn = jax.shard_map(
        step, mesh=mesh, in_specs=P(None, axis, None), out_specs=P(None, axis, None)
    )
    return jax.jit(fn)(jnp.asarray(channels))


def sharded_epf(channels: np.ndarray, rs_px: np.ndarray, mesh: Mesh,
                *, iters: int = 2, channel_scale=(40.0, 5.0, 3.5),
                border_sad_mul: float = 2.0 / 3.0,
                p0_scale: float = 0.9, p2_scale: float = 6.5,
                axis: str = "rows"):
    """Whole-image EPF row-sharded over a device mesh.

    Each of the up-to-3 steps exchanges 3-row halos with mesh neighbors via
    `jax.lax.ppermute` before filtering its shard; outer borders use the
    half-sample mirror like the unsharded path.  `rs_px` is the per-pixel
    reciprocal-sigma plane (see ops.filters.epf_recip_sigmas, expanded to
    pixels).  Shard heights must be multiples of 8 so the 8x8 border/sigma
    blocks stay shard-local."""
    from .filters import KERNELS4, KERNELS12, _epf_step_jax_rows, POS_MULT
    from .pallas_kernels import pallas_available

    n = mesh.devices.size
    H = channels.shape[1]
    assert H % n == 0 and (H // n) % 8 == 0, "shard rows must be 8-aligned"
    shard_h = H // n
    use_pallas = pallas_available()

    def exchange(x):
        # 3-row halos from mesh neighbors; outer shards mirror their own edge
        idx = jax.lax.axis_index(axis)
        top_own = x[:, 2::-1, :]      # symmetric mirror of rows 0..2
        bot_own = x[:, :-4:-1, :]     # symmetric mirror of last 3 rows
        from_above = jax.lax.ppermute(
            x[:, -3:, :], axis, [(i, i + 1) for i in range(n - 1)]
        )
        from_below = jax.lax.ppermute(
            x[:, :3, :], axis, [(i + 1, i) for i in range(n - 1)]
        )
        top = jnp.where(idx == 0, top_own, from_above)
        bottom = jnp.where(idx == n - 1, bot_own, from_below)
        return jnp.concatenate([top, x, bottom], axis=1)

    def step_fn(x, rs):
        idx = jax.lax.axis_index(axis)
        y0 = idx * shard_h
        kw = dict(channel_scale=tuple(channel_scale),
                  border_sad_mul=border_sad_mul)

        def one(x, sscale, kern, cross):
            if use_pallas:
                # per-shard Pallas stripe kernel on the pre-exchanged halos
                # (shard_h is 8-aligned, so the in-kernel 8x8 border mask is
                # shard-local and needs no y0)
                from .pallas_filters import epf_step_pallas_rows

                ss = float(sscale) * POS_MULT
                return epf_step_pallas_rows(
                    exchange(x), rs, kernels=tuple(kern), cross=cross,
                    sigma_scale=ss, border_scale=ss * float(border_sad_mul),
                    channel_scale=tuple(channel_scale),
                )
            return _epf_step_jax_rows(exchange(x), x, rs, y0, sscale, kern,
                                      cross, **kw)

        if iters >= 3:
            x = one(x, p0_scale, KERNELS12, True)
        if iters >= 1:
            x = one(x, 1.0, KERNELS4, True)
        if iters >= 2:
            x = one(x, p2_scale, KERNELS4, False)
        return x

    fn = jax.shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(None, axis, None), P(axis, None)),
        out_specs=P(None, axis, None),
        # pallas_call outputs don't carry vma annotations yet
        check_vma=not use_pallas,
    )
    return jax.jit(fn)(
        jnp.asarray(channels, jnp.float32), jnp.asarray(rs_px, jnp.float32)
    )
