"""Device-side VarDCT reconstruction (JAX/XLA; TPU-first design).

The host entropy stage produces, per LF group, dense per-class batches of
quantized coefficients; everything after that — dequantization, chroma-from-
luma, batched IDCT (MXU matmuls), XYB→sRGB — runs on device under one jit so
XLA fuses the elementwise chains into the matmul pipeline.

Design notes (TPU):
- IDCT of an (N, r, c) batch is two einsums against small basis matrices:
  MXU work with stationary weights.  All blocks of one DctSelect class are
  batched; classes are compiled separately (static shapes).
- The per-block scalars (HfMul^-1, CfL factors) broadcast along the batch dim.
- The block→image scatter uses a precomputed flat index array (host side) and
  a single `.at[].set`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..vardct.dct import forward_matrix, inverse_matrix, lf2llf_scales


@functools.lru_cache(maxsize=None)
def _g(n: int) -> np.ndarray:
    return inverse_matrix(n)


@functools.lru_cache(maxsize=None)
def _f(n: int) -> np.ndarray:
    return forward_matrix(n)


@functools.partial(jax.jit, static_argnames=("log_rows", "log_columns"))
def idct2d_batch(coeffs: jax.Array, log_rows: int, log_columns: int) -> jax.Array:
    """Batched inverse 2-D DCT.

    coeffs: (N, size) canonical-layout coefficients; returns (N, rows, cols).
    """
    rows, columns = 1 << log_rows, 1 << log_columns
    if log_columns > log_rows:
        c = coeffs.reshape(-1, rows, columns)
    else:
        c = jnp.swapaxes(coeffs.reshape(-1, columns, rows), 1, 2)
    Gr = jnp.asarray(_g(rows))
    Gc = jnp.asarray(_g(columns))
    return jnp.einsum(
        "ij,njk,lk->nil", Gr, c, Gc, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("log_rows", "log_columns"))
def llf_forward_batch(lf_blocks: jax.Array, log_rows: int, log_columns: int) -> jax.Array:
    """Batched scaled forward DCT of dequantized LF blocks
    (device dual of vardct.dct.forward_dct2d_scaled_for_llf).

    lf_blocks: (N, vh8, vw8); returns (N, vh8*vw8) canonical flat.
    """
    vh8, vw8 = 1 << (log_rows - 3), 1 << (log_columns - 3)
    F_r = jnp.asarray(_f(vh8))
    F_c = jnp.asarray(_f(vw8))
    f = jnp.einsum("ij,njk,lk->nil", F_r, lf_blocks, F_c,
                   precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
    s = (
        jnp.asarray(lf2llf_scales(log_rows - 3))[None, :, None]
        * jnp.asarray(lf2llf_scales(log_columns - 3))[None, None, :]
    )
    f = f * s
    if vw8 <= vh8:
        f = jnp.swapaxes(f, 1, 2)
    return f.reshape(f.shape[0], -1)


@jax.jit
def dequant_hf_batch(
    q: jax.Array,          # (3, N, size) raw decoded coefficient sums
    weights: jax.Array,    # (size, 3) dequant weight table for this class
    hfmul_inv: jax.Array,  # (N,)
    global_scale_inv: jax.Array,  # scalar 65536/global_scale
    qm_scales: jax.Array,  # (3,) [x_qm, 1, b_qm]
    quant_bias: jax.Array,  # (3,)
    quant_bias_num: jax.Array,  # scalar
) -> jax.Array:
    """Quant-bias adjustment + dequantization (j40.h:7053-7097)."""
    small = jnp.abs(q) <= 1.0
    safe = jnp.where(q == 0, 1.0, q)
    adj = jnp.where(small, q * quant_bias[:, None, None], q - quant_bias_num / safe)
    mult = (global_scale_inv * qm_scales)[:, None, None] * hfmul_inv[None, :, None]
    return adj * mult / weights.T[:, None, :]


@jax.jit
def cfl_batch(coeffs: jax.Array, kx: jax.Array, kb: jax.Array) -> jax.Array:
    """Chroma-from-luma: X += Y*kx, B += Y*kb per block (j40.h:7152-7175).

    coeffs: (3, N, size) in XYB order; kx/kb: (N,)."""
    x = coeffs[0] + coeffs[1] * kx[:, None]
    b = coeffs[2] + coeffs[1] * kb[:, None]
    return jnp.stack([x, coeffs[1], b])


@jax.jit
def xyb_to_srgb_u8(
    samples: jax.Array,     # (3, H, W) XYB
    opsin_inv: jax.Array,   # (3, 3)
    opsin_bias: jax.Array,  # (3,)
    itscale: jax.Array,     # scalar 255/intensity_target
    maxval: jax.Array,      # scalar (1<<bpp)-1
) -> jax.Array:
    """XYB → linear sRGB → gamma → quantized int planes (j40.h:7208-7241).

    Returns (3, H, W) int32 (pre-clamp, matching the reference's cast)."""
    X, Y, B = samples[0], samples[1], samples[2]
    p = jnp.stack([Y + X, Y - X, B])
    cbrt_bias = jnp.cbrt(opsin_bias)
    pp = p - cbrt_bias[:, None, None]
    mixed = (pp * pp * pp + opsin_bias[:, None, None]) * itscale
    v = jnp.einsum("cd,dhw->chw", opsin_inv, mixed, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
    srgb = jnp.where(
        v <= 0.0031308,
        12.92 * v,
        1.055 * jnp.power(jnp.maximum(v, 1e-30), 1.0 / 2.4) - 0.055,
    )
    return (maxval * srgb + 0.5).astype(jnp.int32)


@jax.jit
def smooth_lf(lfquant: jax.Array, inv_m_lf: jax.Array) -> jax.Array:
    """Adaptive LF smoothing, 3x3 self-gating stencil (j40.h:6492-6542).

    lfquant: (3, H8, W8); edges pass through.  Per-LF-group local: no
    cross-group halo is needed (the stencil never crosses the group edge)."""
    W0, W1, W2 = 0.05226273532324128, 0.20345139757231578, 0.0334829185968739
    q = lfquant
    wa = (
        q[:, :-2, :-2] * W2 + q[:, :-2, 1:-1] * W1 + q[:, :-2, 2:] * W2
        + q[:, 1:-1, :-2] * W1 + q[:, 1:-1, 1:-1] * W0 + q[:, 1:-1, 2:] * W1
        + q[:, 2:, :-2] * W2 + q[:, 2:, 1:-1] * W1 + q[:, 2:, 2:] * W2
    )
    center = q[:, 1:-1, 1:-1]
    diff = jnp.abs(wa - center) * inv_m_lf[:, None, None]
    gap = jnp.maximum(0.5, jnp.max(diff, axis=0))
    gap = jnp.maximum(0.0, 3.0 - 4.0 * gap)
    sm = (wa - center) * gap[None] + center
    return q.at[:, 1:-1, 1:-1].set(sm)


def reconstruct_dct8_plane(
    coeffs: np.ndarray,      # (3, N, 64) raw coefficients, N = h8*w8 raster
    llf: np.ndarray,         # (3, N) dequantized LF (one per block)
    hfmul_inv: np.ndarray,   # (N,)
    kx: np.ndarray,          # (N,) per-block CfL factors
    kb: np.ndarray,
    weights: np.ndarray,     # (64, 3)
    consts: dict,
    h8: int,
    w8: int,
):
    """Full device pipeline for the all-DCT8x8 fast path: returns (3, H, W)
    int32 sRGB-quantized planes.  One jit, fully fused."""
    return _reconstruct_dct8_jit(
        jnp.asarray(coeffs),
        jnp.asarray(llf),
        jnp.asarray(hfmul_inv),
        jnp.asarray(kx),
        jnp.asarray(kb),
        jnp.asarray(weights),
        jnp.float32(consts["global_scale_inv"]),
        jnp.asarray(consts["qm_scales"], dtype=jnp.float32),
        jnp.asarray(consts["quant_bias"], dtype=jnp.float32),
        jnp.float32(consts["quant_bias_num"]),
        jnp.asarray(consts["opsin_inv"], dtype=jnp.float32),
        jnp.asarray(consts["opsin_bias"], dtype=jnp.float32),
        jnp.float32(consts["itscale"]),
        jnp.float32(consts["maxval"]),
        h8,
        w8,
    )


@functools.partial(jax.jit, static_argnames=("h8", "w8"))
def _reconstruct_dct8_jit(
    coeffs, llf, hfmul_inv, kx, kb, weights,
    global_scale_inv, qm_scales, quant_bias, quant_bias_num,
    opsin_inv, opsin_bias, itscale, maxval, h8, w8,
):
    deq = dequant_hf_batch(
        coeffs, weights, hfmul_inv, global_scale_inv, qm_scales,
        quant_bias, quant_bias_num,
    )
    cf = cfl_batch(deq, kx, kb)
    # LLF substitution at canonical position 0
    cf = cf.at[:, :, 0].set(llf)
    blocks = idct2d_batch(cf.reshape(-1, 64), 3, 3).reshape(3, h8 * w8, 8, 8)
    # (3, h8*w8, 8, 8) -> (3, H, W)
    samples = (
        blocks.reshape(3, h8, w8, 8, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(3, h8 * 8, w8 * 8)
    )
    return xyb_to_srgb_u8(samples, opsin_inv, opsin_bias, itscale, maxval)
