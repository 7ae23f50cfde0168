"""Pallas TPU kernels for the VarDCT hot path.

Fused dequant + chroma-from-luma + inverse DCT for DCT8x8 block batches.
The whole per-block 2-D IDCT (including the canonical coefficient transpose)
is a dense 64x64 matrix K with samples_flat = K @ coeffs_flat, so the kernel
is one VPU elementwise chain plus one MXU matmul over the lane-aligned
(n, 64) layout — no lane-splitting reshapes, which Mosaic cannot lower.
The block→raster relayout stays outside in XLA (a fused transpose).

See /opt/skills/guides/pallas_guide.md for conventions.  Off TPU the kernel
runs in interpreter mode (tests); production CPU paths use ops.reconstruct.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..vardct.dct import inverse_dct2d


@functools.lru_cache(maxsize=None)
def idct8_matrix() -> np.ndarray:
    """(64, 64) K with samples.ravel() == K @ canonical_coeffs (float32)."""
    cols = []
    for i in range(64):
        e = np.zeros(64, dtype=np.float32)
        e[i] = 1.0
        cols.append(inverse_dct2d(e, 3, 3).ravel())
    return np.stack(cols, axis=1).astype(np.float32)


def _kernel(
    coeffs_ref,     # (3, bn, 64) raw coefficients for this tile
    llf_ref,        # (3, bn) dequantized LF
    scalars_ref,    # (3, bn): hfmul_inv, kx, kb
    weights_ref,    # (64, 3) dequant weight table
    k_ref,          # (64, 64) dense 2-D IDCT operator
    consts_ref,     # (8,): gs_inv, qmx, qmb, qb0, qb1, qb2, qbnum, pad
    out_ref,        # (3, bn, 64) samples (row-major 8x8 per block)
):
    # channels unrolled: Mosaic cannot lower tiny (3,)-axis broadcasts, so
    # everything stays 2-D (bn, 64) with scalar per-channel constants
    gs_inv = consts_ref[0]
    qmv = (jnp.float32(1.0) * consts_ref[1], jnp.float32(1.0), consts_ref[2])
    qbv = (consts_ref[3], consts_ref[4], consts_ref[5])
    qbnum = consts_ref[6]

    hfmul_inv = scalars_ref[0, :]          # (bn,)
    kx = scalars_ref[1, :]
    kb = scalars_ref[2, :]
    pos = jax.lax.broadcasted_iota(jnp.int32, coeffs_ref.shape[1:], 1)
    k = k_ref[:]

    def dequant(c):
        q = coeffs_ref[c]                  # (bn, 64)
        small = jnp.abs(q) <= 1.0
        safe = jnp.where(q == 0.0, 1.0, q)
        adj = jnp.where(small, q * qbv[c], q - qbnum / safe)
        mult = (gs_inv * qmv[c]) * hfmul_inv[:, None]
        return adj * mult / weights_ref[:, c][None, :]

    d0, d1, d2 = dequant(0), dequant(1), dequant(2)
    planes = (d0 + d1 * kx[:, None], d1, d2 + d1 * kb[:, None])
    for c in range(3):
        cf = jnp.where(pos == 0, llf_ref[c, :][:, None], planes[c])
        # samples = K @ coeffs per block: (bn, 64) x (64, 64) on the MXU
        out_ref[c] = jax.lax.dot_general(
            cf, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            # full f32 MXU passes: the default bf16 path loses ~5 bits, which
            # is visible (>16 gray levels) after the 8x8 IDCT accumulation
            precision=jax.lax.Precision.HIGHEST,
        )


@functools.partial(jax.jit, static_argnames=("h8", "w8", "tile"))
def reconstruct_dct8_pallas(
    coeffs,      # (3, h8*w8, 64) float32 or int16 (converted on device)
    llf,         # (3, h8*w8)
    hfmul_inv,   # (h8*w8,)
    kx, kb,      # (h8*w8,)
    weights,     # (64, 3)
    consts,      # (8,) packed floats
    h8: int,
    w8: int,
    tile: int = 512,
):
    """Fused dequant+CfL+IDCT for an all-DCT8x8 LF group; returns XYB samples
    (3, h8*8, w8*8) float32."""
    n = h8 * w8
    coeffs = coeffs.astype(jnp.float32)
    llf = llf.astype(jnp.float32)
    k = jnp.asarray(idct8_matrix())
    scalars = jnp.stack([hfmul_inv, kx, kb])

    tile = min(tile, n)
    npad = -n % tile  # ragged sizes: zero-pad the block axis to the tile
    if npad:          # (a single whole-array program would blow scoped VMEM)
        coeffs = jnp.pad(coeffs, ((0, 0), (0, npad), (0, 0)))
        llf = jnp.pad(llf, ((0, 0), (0, npad)))
        scalars = jnp.pad(scalars, ((0, 0), (0, npad)))
    grid = ((n + npad) // tile,)

    blocks = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tile, 64), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, tile, 64), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n + npad, 64), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(coeffs, llf, scalars, weights, k, consts)
    if npad:
        blocks = blocks[:, :n]
    # block -> raster layout (fused by XLA)
    return (
        blocks.reshape(3, h8, w8, 8, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(3, h8 * 8, w8 * 8)
    )


def _xyb_to_srgb_block(xyb, consts_ref):
    """XYB -> quantized sRGB int32, pointwise over same-shape planes
    (j40.h:7208-7241); shared by _srgb_kernel and _xyb_kernel.  cbrt and
    pow go through exp/log (Mosaic has no cbrt/pow primitives)."""
    itscale = consts_ref[20]
    maxval = consts_ref[21]
    X, Y, B = xyb
    p = (Y + X, Y - X, B)
    mixed = []
    for d in range(3):
        bias = consts_ref[17 + d]
        ab = jnp.maximum(jnp.abs(bias), jnp.float32(1e-38))
        cbrt_bias = jnp.where(
            bias == 0.0,
            jnp.float32(0.0),
            jnp.sign(bias) * jnp.exp(jnp.log(ab) * jnp.float32(1.0 / 3.0)),
        )
        pp = p[d] - cbrt_bias
        mixed.append((pp * pp * pp + bias) * itscale)
    out = []
    for c in range(3):
        v = (mixed[0] * consts_ref[8 + c * 3]
             + mixed[1] * consts_ref[9 + c * 3]
             + mixed[2] * consts_ref[10 + c * 3])
        gam = jnp.float32(1.055) * jnp.exp(
            jnp.log(jnp.maximum(v, jnp.float32(1e-30))) * jnp.float32(1.0 / 2.4)
        ) - jnp.float32(0.055)
        srgb = jnp.where(v <= jnp.float32(0.0031308), jnp.float32(12.92) * v, gam)
        out.append((maxval * srgb + jnp.float32(0.5)).astype(jnp.int32))
    return out


def _srgb_kernel(
    coeffs_ref,     # (3, bn, 64)
    llf_ref,        # (3, bn)
    scalars_ref,    # (3, bn): hfmul_inv, kx, kb
    weights_ref,    # (64, 3)
    k_ref,          # (64, 64)
    consts_ref,     # (22,): [8 dequant][9 opsin_inv][3 opsin_bias][itscale, maxval]
    out_ref,        # (3, bn, 64) int32 sRGB (block layout, pre-clamp)
):
    """Fully fused dequant + CfL + IDCT + XYB→sRGB quantization, all in the
    block layout.  Keeping XYB in-kernel removes the XLA elementwise stage
    between the IDCT custom call and the relayout — measured ~1.2ms of
    composition overhead per MP on v5e (layout/fusion pathology), vs ~90us
    for this whole kernel."""
    gs_inv = consts_ref[0]
    qmv = (jnp.float32(1.0) * consts_ref[1], jnp.float32(1.0), consts_ref[2])
    qbv = (consts_ref[3], consts_ref[4], consts_ref[5])
    qbnum = consts_ref[6]

    hfmul_inv = scalars_ref[0, :]
    kx = scalars_ref[1, :]
    kb = scalars_ref[2, :]
    pos = jax.lax.broadcasted_iota(jnp.int32, coeffs_ref.shape[1:], 1)
    k = k_ref[:]

    def dequant(c):
        q = coeffs_ref[c]
        small = jnp.abs(q) <= 1.0
        safe = jnp.where(q == 0.0, 1.0, q)
        adj = jnp.where(small, q * qbv[c], q - qbnum / safe)
        mult = (gs_inv * qmv[c]) * hfmul_inv[:, None]
        return adj * mult / weights_ref[:, c][None, :]

    d0, d1, d2 = dequant(0), dequant(1), dequant(2)
    planes = (d0 + d1 * kx[:, None], d1, d2 + d1 * kb[:, None])
    xyb = []
    for c in range(3):
        cf = jnp.where(pos == 0, llf_ref[c, :][:, None], planes[c])
        xyb.append(jax.lax.dot_general(
            cf, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ))

    srgb = _xyb_to_srgb_block(tuple(xyb), consts_ref)
    for c in range(3):
        out_ref[c] = srgb[c]


@functools.partial(jax.jit, static_argnames=("h8", "w8", "tile"))
def reconstruct_dct8_srgb_pallas(
    coeffs,      # (3, h8*w8, 64) float32
    llf,         # (3, h8*w8)
    hfmul_inv, kx, kb,
    weights,     # (64, 3)
    consts22,    # (22,) packed floats (see _srgb_kernel)
    h8: int,
    w8: int,
    tile: int = 512,
):
    """One-kernel reconstruction to quantized sRGB: returns (3, h8*8, w8*8)
    int32 samples (pre-clamp), raster layout."""
    n = h8 * w8
    coeffs = coeffs.astype(jnp.float32)
    llf = llf.astype(jnp.float32)
    k = jnp.asarray(idct8_matrix())
    scalars = jnp.stack([hfmul_inv, kx, kb])

    tile = min(tile, n)
    npad = -n % tile
    if npad:
        coeffs = jnp.pad(coeffs, ((0, 0), (0, npad), (0, 0)))
        llf = jnp.pad(llf, ((0, 0), (0, npad)))
        scalars = jnp.pad(scalars, ((0, 0), (0, npad)))
    grid = ((n + npad) // tile,)

    blocks = pl.pallas_call(
        _srgb_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tile, 64), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, tile, 64), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n + npad, 64), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(coeffs, llf, scalars, weights, k, consts22)
    if npad:
        blocks = blocks[:, :n]
    return (
        blocks.reshape(3, h8, w8, 8, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(3, h8 * 8, w8 * 8)
    )


def _xyb_kernel(plane_ref, consts_ref, out_ref):
    """Pointwise XYB→sRGB quantization on a (3, T, W) raster tile (same math
    as reconstruct.xyb_to_srgb_u8; kept as a Pallas kernel because XLA's
    fusion of this stage with neighboring transposes/custom-calls measured
    ~8x slower than the arithmetic itself on v5e)."""
    srgb = _xyb_to_srgb_block(
        (plane_ref[0], plane_ref[1], plane_ref[2]), consts_ref)
    for c in range(3):
        out_ref[c] = srgb[c]


@functools.partial(jax.jit, static_argnames=("tile",))
def xyb_to_srgb_pallas(plane, consts22, tile: int = 256):
    """(3, H, W) float32 XYB → (3, H, W) int32 quantized sRGB (pre-clamp)."""
    _, H, W = plane.shape
    # stripe height adapts to width: the working set (~12 rows-equivalents
    # of W lanes) must fit scoped VMEM — a fixed 256-row stripe OOMs at
    # 2048x2048 (a full LF group; found on hardware)
    t_fit = max(8, (3_300_000 // (W * 4 * 12) // 8) * 8)
    T = min(tile, t_fit, -(-H // 8) * 8)
    Hp = -(-H // T) * T
    if Hp != H:
        plane = jnp.pad(plane, ((0, 0), (0, Hp - H), (0, 0)))
    out = pl.pallas_call(
        _xyb_kernel,
        grid=(Hp // T,),
        in_specs=[
            pl.BlockSpec((3, T, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, T, W), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, Hp, W), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(plane, consts22)
    return out[:, :H] if Hp != H else out


def pallas_available() -> bool:
    import os

    import jax

    if os.environ.get("J40T_PALLAS") == "interp":
        # test hook: exercise the Pallas code paths in interpreter mode on
        # CPU (the pallas_call interpret flag keys off the backend)
        return True
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=("h8", "w8", "to_u8"))
def reconstruct_dct8_full(
    coeffs,      # (3, n, 64) int8 (clipped) / int16 / float32
    exc_idx,     # (m,) int32 flat positions whose true value exceeds int8
    exc_val,     # (m,) int32 exact values for those positions
    aux,         # (6, n) float32: llf x/y/b, hfmul_inv, kx, kb
    weights,     # (64, 3)
    consts,      # (22,): [8 dequant consts][9 opsin_inv][3 opsin_bias][itscale, maxval]
    h8: int,
    w8: int,
    to_u8: bool = True,
):
    """Single-dispatch reconstruction: one fused Pallas kernel carries
    dequant+CfL+IDCT+XYB→sRGB; clamped uint8 output.  One host→device
    transfer for all per-group data and one device→host fetch — the
    tunnel-latency optimal shape for this dev host.  Coefficients arrive as
    a clipped int8 plane plus an exact-value exception list (typically
    <0.5% of entries), a ~2x smaller upload than int16; the scatter
    rebuilds the exact plane in XLA before the Pallas kernel."""
    dense = coeffs.astype(jnp.float32)
    dense = (
        dense.reshape(-1)
        .at[exc_idx]
        .set(exc_val.astype(jnp.float32))
        .reshape(dense.shape)
    )
    out = reconstruct_dct8_srgb_pallas(
        dense, aux[0:3], aux[3], aux[4], aux[5], weights, consts, h8, w8
    )
    if to_u8:
        out = jnp.clip(out, 0, 255).astype(jnp.uint8)
    return out
