"""Device-side LF-group reconstruction: per-DctSelect-class batching.

Every inverse transform in JPEG XL is linear, so the 8x8 special transforms
(Hornuss, DCT2x2, DCT4x4, DCT4x8, DCT8x4, AFV0-3) are precomputed as dense
64x64 matrices and the large DCTs as two-sided basis matmuls — the entire
coefficient→sample stage is MXU work batched per class.  Elementwise stages
(dequant, CfL, XYB→sRGB) fuse around the matmuls under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..vardct import special
from ..vardct.tables import DCT_SELECT, QM_SCALE
from .reconstruct import idct2d_batch, xyb_to_srgb_u8

# small on-device caches for constant tables, keyed by content: the dev-host
# tunnel makes every host->device transfer expensive, and these arrays repeat
# across decodes (library dequant weights, opsin constants)
_DEVICE_CACHE: dict = {}


def _cached_device(key, np_arr):
    import jax

    ent = _DEVICE_CACHE.get(key)
    if ent is None or ent[0] != np_arr.tobytes():
        ent = (np_arr.tobytes(), jnp.asarray(np_arr))
        _DEVICE_CACHE[key] = ent
    return ent[1]

# dctsel values handled by dense 64x64 matrices; the operator builder lives
# in vardct/special.py (pure numpy) so the native host plan shares it
# without a jax dependency
_SPECIAL_FNS = frozenset(special._SPECIAL_FNS)
special_matrix = special.special_matrix


@functools.partial(jax.jit, static_argnames=("dctsel",))
def _class_pipeline(
    coeffs,      # (3, N, size)
    llf,         # (3, N, llfsize)
    llf_idx,     # (llfsize,) int32 canonical positions of LLF coeffs
    hfmul_inv,   # (N,)
    kx, kb,      # (N,)
    weights,     # (size, 3)
    global_scale_inv, qm_scales, quant_bias, quant_bias_num,
    dctsel,
):
    """Dequant + CfL + LLF substitution + inverse transform for one class.

    Returns (3, N, rows, cols) float32 samples."""
    log_rows, log_columns, _, _ = DCT_SELECT[dctsel]
    small = jnp.abs(coeffs) <= 1.0
    safe = jnp.where(coeffs == 0, 1.0, coeffs)
    adj = jnp.where(small, coeffs * quant_bias[:, None, None],
                    coeffs - quant_bias_num / safe)
    mult = (global_scale_inv * qm_scales)[:, None, None] * hfmul_inv[None, :, None]
    deq = adj * mult / weights.T[:, None, :]
    # CfL
    x = deq[0] + deq[1] * kx[:, None]
    b = deq[2] + deq[1] * kb[:, None]
    cf = jnp.stack([x, deq[1], b])
    # LLF substitution
    cf = cf.at[:, :, llf_idx].set(llf)
    n = cf.shape[1]
    flat = cf.reshape(3 * n, -1)
    if dctsel in _SPECIAL_FNS:
        M = jnp.asarray(special_matrix(dctsel))
        out = jnp.einsum("ij,nj->ni", M, flat, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
        return out.reshape(3, n, 8, 8)
    out = idct2d_batch(flat, log_rows, log_columns)
    return out.reshape(3, n, 1 << log_rows, 1 << log_columns)


def _pack_i8(arr: np.ndarray):
    """Narrowest lossless upload: clipped int8 plane + exact-value exception
    list (quantized HF coeffs rarely exceed |127|), ~4x fewer host->device
    bytes than f32 on the tunnel.  Exception capacity is bucketed to powers
    of two to bound jit signatures."""
    flat = arr.reshape(-1)
    cup = np.clip(arr, -127, 127).astype(np.int8)
    exc = np.flatnonzero(np.abs(flat) > 127).astype(np.int64)
    cap = max(64, 1 << int(len(exc)).bit_length())
    exc_idx = np.zeros(cap, np.int32)
    exc_val = np.full(
        cap,
        np.int32(round(float(flat[0]))) if flat.size else np.int32(0),
        np.int32,
    )
    if len(exc):
        exc_idx[1 : 1 + len(exc)] = exc
        exc_val[1 : 1 + len(exc)] = np.round(flat[exc]).astype(np.int32)
    return cup, exc_idx, exc_val


def _pack_i4(arr: np.ndarray):
    """Nibble-packed upload: values in [-8, 7] as 4-bit biased codes, two
    per byte along the last axis, plus an exact exception list.  Halves the
    host->device bytes of the int8 pack on sparse/low-amplitude coefficient
    planes (photo-like VarDCT content at d1.0 has |q|<=7 for ~95%+ of
    coefficients); the dense noise corpus falls back to int8 via the byte
    accounting in `pack_coeffs_auto`."""
    assert arr.shape[-1] % 2 == 0
    q = np.round(arr).astype(np.int32)
    flat = q.reshape(-1)
    clip = np.clip(q, -8, 7)
    u = (clip + 8).astype(np.uint8)
    packed = (u[..., 0::2] | (u[..., 1::2] << 4)).astype(np.uint8)
    exc = np.flatnonzero((flat < -8) | (flat > 7)).astype(np.int64)
    cap = max(64, 1 << int(len(exc)).bit_length())
    exc_idx = np.zeros(cap, np.int32)
    exc_val = np.full(
        cap,
        np.int32(flat[0]) if flat.size else np.int32(0),
        np.int32,
    )
    if len(exc):
        exc_idx[1 : 1 + len(exc)] = exc
        exc_val[1 : 1 + len(exc)] = flat[exc]
    return packed, exc_idx, exc_val


def pack_coeffs_auto(arr: np.ndarray):
    """Pick the narrowest lossless upload encoding for a coefficient plane:
    4-bit biased nibbles vs clipped int8, each with an exact-value exception
    list.  Returns (kind, packed, exc_idx, exc_val) with kind in
    {"i4", "i8"}; the byte accounting includes the 8-byte-per-entry
    exception cost so noisy planes keep the int8 form."""
    # coefficient planes are integral-valued f32 (exact int accumulation),
    # so magnitude tests run on the float array without a rounding pass
    a = np.abs(arr.reshape(-1))
    n = a.size
    exc4 = int(np.count_nonzero(a > 7))  # [-8..7] biased, -8 unused by exc
    exc8 = int(np.count_nonzero(a > 127))
    bytes4 = n // 2 + 8 * exc4
    bytes8 = n + 8 * exc8
    if bytes4 < bytes8:
        return ("i4", *_pack_i4(arr))
    return ("i8", *_pack_i8(arr))


def unpack_i4_jax(packed, shape):
    """Device-side inverse of `_pack_i4` (before exception scatter): biased
    nibbles -> int8 values in [-8, 7]."""
    import jax.numpy as jnp

    lo = (packed & jnp.uint8(0x0F)).astype(jnp.int32) - 8
    hi = (packed >> jnp.uint8(4)).astype(jnp.int32) - 8
    out = jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)
    return out.reshape(shape)


def _opsin_tail14(im) -> np.ndarray:
    """consts[8:22]: opsin_inv (9) | opsin_bias (3) | itscale | maxval —
    the XYB->sRGB section consumed by index in the Pallas kernels."""
    return np.concatenate(
        [
            np.asarray(im.opsin_inv_mat, np.float32).ravel(),
            np.asarray(im.opsin_bias, np.float32),
            np.asarray(
                [255.0 / im.intensity_target, (1 << im.bpp) - 1], np.float32
            ),
        ]
    )


def _pack_consts22(vs, im, f, consts) -> np.ndarray:
    return np.concatenate(
        [
            np.asarray(
                [
                    consts["global_scale_inv"],
                    consts["qm_scales"][0],
                    consts["qm_scales"][2],
                    consts["quant_bias"][0],
                    consts["quant_bias"][1],
                    consts["quant_bias"][2],
                    consts["quant_bias_num"],
                    0.0,
                ],
                dtype=np.float32,
            ),
            _opsin_tail14(im),
        ]
    )


@functools.partial(jax.jit, static_argnames=("big_ds", "h8", "w8", "to_u8"))
def _mixed_full(
    dense,       # (3, h8*w8, 64) int8 coeffs on the full 8x8 grid (big-block
                 # cells zero; overlaid below)
    exc_idx, exc_val,
    aux,         # (6, h8*w8): llf x/y/b (LF-CfL applied), hfmul_inv, kx, kb
    weights8,    # (64, 3) DCT8 dequant table
    consts22,
    bigs,        # tuple per big class: (coeffs(3,n,size), llf(3,n,llfsize),
                 #   hfmul_inv(n,), kx(n,), kb(n,), weights(size,3),
                 #   scatter_idx(n*rows*cols,) int32 into the raster plane)
    big_ds: tuple,
    h8: int, w8: int, to_u8: bool,
):
    """Single-dispatch reconstruction of a mixed-DctSelect LF group: the
    dense 8x8 grid runs the fused Pallas kernel (big-block cells decode to
    zero), then each non-8x8 class is batch-transformed and overlaid with
    one scatter — everything device-side under one jit, one small int8
    upload and one uint8 fetch (the reference's per-varblock dispatch loop,
    j40.h:7178-7191, recast as class-batched MXU work)."""
    from .pallas_kernels import reconstruct_dct8_pallas

    d = dense.astype(jnp.float32)
    d = d.reshape(-1).at[exc_idx].set(exc_val.astype(jnp.float32)).reshape(d.shape)
    samples = reconstruct_dct8_pallas(
        d, aux[0:3], aux[3], aux[4], aux[5], weights8, consts22[:8], h8, w8
    )
    flat = samples.reshape(3, -1)
    qm_scales = jnp.stack([consts22[1], jnp.float32(1.0), consts22[2]])
    for ds, (bc, bllf, bhf, bkx, bkb, bw, bidx) in zip(big_ds, bigs):
        log_rows, log_columns, _, _ = DCT_SELECT[ds]
        vh8 = 1 << (min(log_rows, log_columns) - 3)
        vw8 = 1 << (max(log_rows, log_columns) - 3)
        llf_idx = np.array(
            [y * (vw8 * 8) + x for y in range(vh8) for x in range(vw8)], np.int32
        )
        s = _class_pipeline(
            bc.astype(jnp.float32), bllf, jnp.asarray(llf_idx),
            bhf, bkx, bkb, bw,
            consts22[0], qm_scales, consts22[3:6], consts22[6], ds,
        )
        flat = flat.at[:, bidx].set(s.reshape(3, -1))
    plane = flat.reshape(3, h8 * 8, w8 * 8)
    from .pallas_kernels import xyb_to_srgb_pallas

    out = xyb_to_srgb_pallas(plane, consts22)
    if to_u8:
        out = jnp.clip(out, 0, 255).astype(jnp.uint8)
    return out


def gather_full_dct8(vs, gg, im, f):
    """Host gather for an all-DCT8x8 LF group, blocks in raster order:
    returns (coeffs (3,n,64) f32, aux (6,n) f32, weights (64,3), consts22).
    Used by the per-group fused path and the cross-image batched decoder
    (parallel.batch), which stacks several groups along the block axis."""
    blocks_arr = np.asarray(gg.blocks)
    assert ((blocks_arr >> 20) == 2).all(), "not an all-DCT8x8 group"
    voffs = (blocks_arr & 0xFFFFF).reshape(-1)  # raster order
    offs = np.asarray(gg.vb_coeffoff)[voffs]
    cidx = offs[:, None] + np.arange(64)[None, :]
    coeffs = np.stack([gg.coeffs[c][cidx] for c in range(3)]).astype(np.float32)
    return (coeffs, *_plan_aux_dct8(vs, gg, im, f, voffs, offs))


def gather_pack_dct8_i8(vs, gg, im, f):
    """Fused gather+pack for the device serving path: like
    `gather_full_dct8` but emits the clamped-int8 upload form in one native
    pass over the coefficient planes (no dense f32 intermediate; see
    `native/core.cpp::j40t_gather_pack_dct8`).  Returns
    ((i8 (3,n,64), exc_idx, exc_val, n_gt7, fill0), aux, weights, consts)
    where fill0 is the exact int32 value of flat position 0 (the exception
    scatter's fill target) and exc indices are image-flat."""
    from ..native.bindings import gather_pack_dct8 as native_gather

    blocks_arr = np.asarray(gg.blocks)
    assert ((blocks_arr >> 20) == 2).all(), "not an all-DCT8x8 group"
    voffs = (blocks_arr & 0xFFFFF).reshape(-1)  # raster order
    offs = np.asarray(gg.vb_coeffoff)[voffs]
    packed = native_gather(gg.coeffs, blocks_arr, offs=np.asarray(gg.vb_coeffoff))
    if packed is None:  # no native library: dense gather + numpy pack
        from ..native.bindings import pack_coeffs_i8

        cidx = offs[:, None] + np.arange(64)[None, :]
        coeffs = np.stack(
            [gg.coeffs[c][cidx] for c in range(3)]
        ).astype(np.float32)
        i8, eidx, eval_, gt7 = pack_coeffs_i8(coeffs)
        packed = (i8, eidx, eval_, gt7, int(coeffs.reshape(-1)[0]))
    return (packed, *_plan_aux_dct8(vs, gg, im, f, voffs, offs))


def _plan_aux_dct8(vs, gg, im, f, voffs, offs):
    """Per-block dequant/CfL auxiliary planes + kernel constants shared by
    the dense and packed DCT8x8 gathers: (aux (6,n) f32, weights, consts22)."""
    n = len(voffs)
    kx_lf = np.float32(vs.base_corr_x + vs.x_factor_lf * vs.inv_colour_factor)
    kb_lf = np.float32(vs.base_corr_b + vs.b_factor_lf * vs.inv_colour_factor)
    lidx = offs >> 6
    lx = gg.llfcoeffs[0][lidx]
    ly = gg.llfcoeffs[1][lidx]
    lb = gg.llfcoeffs[2][lidx]
    cy, cx = np.divmod(np.arange(n), gg.width8)
    kx = (
        vs.base_corr_x
        + vs.inv_colour_factor * np.asarray(gg.xfromy)[cy // 8, cx // 8]
    ).astype(np.float32)
    kb = (
        vs.base_corr_b
        + vs.inv_colour_factor * np.asarray(gg.bfromy)[cy // 8, cx // 8]
    ).astype(np.float32)
    aux = np.stack([
        (lx + ly * kx_lf).astype(np.float32),
        ly.astype(np.float32),
        (lb + ly * kb_lf).astype(np.float32),
        np.asarray(gg.vb_hfmul_inv)[voffs].astype(np.float32),
        kx, kb,
    ])
    consts = dict(
        global_scale_inv=np.float32(65536.0 / vs.global_scale),
        qm_scales=np.array(
            [QM_SCALE[f.x_qm_scale], 1.0, QM_SCALE[f.b_qm_scale]], np.float32
        ),
        quant_bias=np.asarray(im.quant_bias, np.float32),
        quant_bias_num=np.float32(im.quant_bias_num),
    )
    param_idx = DCT_SELECT[0][2]
    return aux, vs.dq_weights[param_idx], _pack_consts22(vs, im, f, consts)


def _fused_mixed_dispatch(
    vs, gg, im, f, classes, corner_y, corner_x, consts, kx_lf, kb_lf
):
    """Assemble the dense 8x8-grid coefficient plane + per-class overlay
    batches for `_mixed_full` (host side, vectorized) and dispatch it."""
    ggw8, ggh8 = gg.width8, gg.height8
    n8 = ggh8 * ggw8
    dense = np.zeros((3, n8, 64), np.float32)
    aux = np.zeros((6, n8), np.float32)
    bigs = []
    big_ds = []
    for ds, voffs in sorted(classes.items()):
        log_rows, log_columns, param_idx, _ = DCT_SELECT[ds]
        rows, cols = 1 << log_rows, 1 << log_columns
        size = rows * cols
        vh8 = 1 << (min(log_rows, log_columns) - 3)
        vw8 = 1 << (max(log_rows, log_columns) - 3)
        llfsize = vh8 * vw8
        offs = np.asarray(gg.vb_coeffoff)[voffs]
        y8s, x8s = corner_y[voffs], corner_x[voffs]
        lidx = (offs[:, None] >> 6) + np.arange(llfsize)[None, :]
        lx = gg.llfcoeffs[0][lidx]
        ly = gg.llfcoeffs[1][lidx]
        lb = gg.llfcoeffs[2][lidx]
        llf = np.stack([lx + ly * kx_lf, ly, lb + ly * kb_lf]).astype(np.float32)
        hfmul_inv = np.asarray(gg.vb_hfmul_inv)[voffs].astype(np.float32)
        kx = (
            vs.base_corr_x
            + vs.inv_colour_factor * np.asarray(gg.xfromy)[y8s // 8, x8s // 8]
        ).astype(np.float32)
        kb = (
            vs.base_corr_b
            + vs.inv_colour_factor * np.asarray(gg.bfromy)[y8s // 8, x8s // 8]
        ).astype(np.float32)
        if ds == 0:
            pos = y8s * ggw8 + x8s
            cidx = offs[:, None] + np.arange(64)[None, :]
            for c in range(3):
                dense[c][pos] = gg.coeffs[c][cidx]
            aux[0:3, pos] = llf[:, :, 0]
            aux[3, pos] = hfmul_inv
            aux[4, pos] = kx
            aux[5, pos] = kb
        else:
            cidx = offs[:, None] + np.arange(size)[None, :]
            coeffs = np.stack(
                [gg.coeffs[c][cidx] for c in range(3)]
            ).astype(np.float32)
            W = ggw8 * 8
            ys = y8s[:, None, None] * 8 + np.arange(rows)[None, :, None]
            xs = x8s[:, None, None] * 8 + np.arange(cols)[None, None, :]
            bidx = (ys * W + xs).astype(np.int32).reshape(-1)
            bigs.append(
                (
                    jnp.asarray(coeffs),
                    jnp.asarray(llf),
                    jnp.asarray(hfmul_inv),
                    jnp.asarray(kx),
                    jnp.asarray(kb),
                    _cached_device(("w", param_idx), vs.dq_weights[param_idx]),
                    jnp.asarray(bidx),
                )
            )
            big_ds.append(int(ds))
    cup, exc_idx, exc_val = _pack_i8(dense)
    consts22 = _pack_consts22(vs, im, f, consts)
    p8 = DCT_SELECT[0][2]
    if vs.dq_weights[p8] is None:
        # the dense-grid kernel always runs the DCT8 table, even when the
        # stream itself has no 8x8 varblocks (lazy loading skips it then)
        from ..vardct.dequant import load_dq_matrix

        vs.dq_weights[p8] = load_dq_matrix(p8, vs.dq_matrix[p8])
    return _mixed_full(
        jnp.asarray(cup),
        jnp.asarray(exc_idx),
        jnp.asarray(exc_val),
        jnp.asarray(aux),
        _cached_device(("w", p8), vs.dq_weights[p8]),
        _cached_device(("pc22",), consts22),
        tuple(bigs),
        tuple(big_ds),
        ggh8,
        ggw8,
        im.bpp == 8,
    )


def combine_lf_group_jax(vs, gg, im) -> np.ndarray:
    """JAX reconstruction of one LF group: returns (3, ggh, ggw) int32 planes.

    Matches VarDCTState.dequant_hf + _combine_lf_group (numpy oracle) within
    float tolerance."""
    dev, ggh, ggw = combine_lf_group_jax_async(vs, gg, im)
    return np.asarray(dev)[:, :ggh, :ggw].astype(np.int32)


def combine_lf_group_jax_async(vs, gg, im):
    """Dispatch one LF group's reconstruction; returns (device_array, ggh,
    ggw) WITHOUT fetching — callers with several LF groups dispatch them all
    so uploads/compute/fetches pipeline through the runtime's async queue."""
    f = vs.fs.f
    ggw, ggh = gg.width, gg.height
    ggw8, ggh8 = gg.width8, gg.height8

    kx_lf = np.float32(vs.base_corr_x + vs.x_factor_lf * vs.inv_colour_factor)
    kb_lf = np.float32(vs.base_corr_b + vs.b_factor_lf * vs.inv_colour_factor)

    # group varblocks by dctsel (host, vectorized over the block map)
    blocks_arr = np.asarray(gg.blocks)
    corner_mask = (blocks_arr >> 20) >= 2
    cy, cx = np.nonzero(corner_mask)
    ds_all = (blocks_arr[cy, cx] >> 20) - 2
    voff_all = blocks_arr[cy, cx] & 0xFFFFF
    classes: dict[int, np.ndarray] = {}
    corner_y = np.empty(gg.nb_varblocks, dtype=np.int64)
    corner_x = np.empty(gg.nb_varblocks, dtype=np.int64)
    corner_y[voff_all] = cy
    corner_x[voff_all] = cx
    for ds in np.unique(ds_all):
        classes[int(ds)] = voff_all[ds_all == ds]

    plane = jnp.zeros((3, ggh8 * 8, ggw8 * 8), dtype=jnp.float32)
    consts = dict(
        global_scale_inv=np.float32(65536.0 / vs.global_scale),
        qm_scales=np.array(
            [QM_SCALE[f.x_qm_scale], 1.0, QM_SCALE[f.b_qm_scale]], np.float32
        ),
        quant_bias=np.asarray(im.quant_bias, np.float32),
        quant_bias_num=np.float32(im.quant_bias_num),
    )

    from .pallas_kernels import pallas_available

    full_dct8_only = set(classes) == {0} and len(classes[0]) == ggh8 * ggw8
    if (
        pallas_available()
        and not getattr(vs.fs, "apply_filters", False)
        and not full_dct8_only
    ):
        out = _fused_mixed_dispatch(
            vs, gg, im, f, classes, corner_y, corner_x, consts, kx_lf, kb_lf
        )
        return out, ggh, ggw

    for ds, voffs in sorted(classes.items()):
        log_rows, log_columns, param_idx, _ = DCT_SELECT[ds]
        rows, cols = 1 << log_rows, 1 << log_columns
        size = rows * cols
        vh8 = 1 << (min(log_rows, log_columns) - 3)
        vw8 = 1 << (max(log_rows, log_columns) - 3)
        llfsize = vh8 * vw8
        n = len(voffs)
        # vectorized gathers: coefficient slices are contiguous per varblock
        offs = np.asarray(gg.vb_coeffoff)[voffs]
        cidx = offs[:, None] + np.arange(size)[None, :]
        coeffs = np.stack([gg.coeffs[c][cidx] for c in range(3)]).astype(np.float32)
        lidx = (offs[:, None] >> 6) + np.arange(llfsize)[None, :]
        lx = gg.llfcoeffs[0][lidx]
        ly = gg.llfcoeffs[1][lidx]
        lb = gg.llfcoeffs[2][lidx]
        llf = np.stack([lx + ly * kx_lf, ly, lb + ly * kb_lf])
        hfmul_inv = np.asarray(gg.vb_hfmul_inv)[voffs].astype(np.float32)
        y8s, x8s = corner_y[voffs], corner_x[voffs]
        kx = (
            vs.base_corr_x
            + vs.inv_colour_factor
            * np.asarray(gg.xfromy)[y8s // 8, x8s // 8]
        ).astype(np.float32)
        kb = (
            vs.base_corr_b
            + vs.inv_colour_factor
            * np.asarray(gg.bfromy)[y8s // 8, x8s // 8]
        ).astype(np.float32)
        # canonical positions of LLF coefficients: y*(2^max)+x
        llf_idx = np.array(
            [y * (vw8 * 8) + x for y in range(vh8) for x in range(vw8)], np.int32
        )
        weights = vs.dq_weights[param_idx]

        full_dct8 = ds == 0 and n == ggh8 * ggw8
        if full_dct8:
            if pallas_available() and not getattr(vs.fs, "apply_filters", False):
                # single-dispatch fused path: dequant+CfL+IDCT (Pallas) + XYB
                # +quantize in ONE device call, int8+exceptions coeffs + one
                # merged aux upload, clamped uint8 fetch
                from .pallas_kernels import reconstruct_dct8_full

                pconsts = _pack_consts22(vs, im, f, consts)
                cup, exc_idx, exc_val = _pack_i8(coeffs)
                aux = np.concatenate(
                    [llf.reshape(3, n), hfmul_inv[None], kx[None], kb[None]]
                ).astype(np.float32)
                out = reconstruct_dct8_full(
                    jnp.asarray(cup), jnp.asarray(exc_idx), jnp.asarray(exc_val),
                    jnp.asarray(aux),
                    _cached_device(("w", param_idx), weights),
                    _cached_device(("pc22",), pconsts),
                    ggh8, ggw8, im.bpp == 8,
                )
                return out, ggh, ggw

        samples = _class_pipeline(
            jnp.asarray(coeffs), jnp.asarray(llf), jnp.asarray(llf_idx),
            jnp.asarray(hfmul_inv), jnp.asarray(kx), jnp.asarray(kb),
            jnp.asarray(weights),
            jnp.float32(consts["global_scale_inv"]),
            jnp.asarray(consts["qm_scales"]),
            jnp.asarray(consts["quant_bias"]),
            jnp.float32(consts["quant_bias_num"]),
            ds,
        )
        if full_dct8:
            plane = (
                samples.reshape(3, ggh8, ggw8, 8, 8)
                .transpose(0, 1, 3, 2, 4)
                .reshape(3, ggh8 * 8, ggw8 * 8)
            )
        else:
            W = ggw8 * 8
            ys = (y8s[:, None, None] * 8 + np.arange(rows)[None, :, None])
            xs = (x8s[:, None, None] * 8 + np.arange(cols)[None, None, :])
            idx = (ys * W + xs).astype(np.int32)
            flat = plane.reshape(3, -1)
            flat = flat.at[:, jnp.asarray(idx.ravel())].set(
                samples.reshape(3, -1)
            )
            plane = flat.reshape(3, ggh8 * 8, ggw8 * 8)

    if getattr(vs.fs, "apply_filters", False):
        from .filters import epf_jax, gaborish_jax

        if f.gab_enabled:
            plane = gaborish_jax(plane, f.gab_weights)
        plane = epf_jax(plane, vs, gg, is_modular=False)

    if jax.default_backend() == "tpu":
        from .pallas_kernels import xyb_to_srgb_pallas

        c22 = np.concatenate([np.zeros(8, np.float32), _opsin_tail14(im)])
        out = xyb_to_srgb_pallas(
            plane, _cached_device(("xyb22",) + tuple(c22.tolist()), c22))
    else:
        out = xyb_to_srgb_u8(
            plane,
            jnp.asarray(im.opsin_inv_mat, dtype=jnp.float32),
            jnp.asarray(im.opsin_bias, dtype=jnp.float32),
            jnp.float32(255.0 / im.intensity_target),
            jnp.float32((1 << im.bpp) - 1),
        )
    if im.bpp == 8:
        # clamp on device and fetch uint8: 4x less device->host traffic (the
        # render stage clips to [0, 255] anyway)
        out = jnp.clip(out, 0, 255).astype(jnp.uint8)
    return out, ggh, ggw
