"""Pallas TPU kernel: FPN multilevel RoIAlign.

The XLA path (``ops/roi_align.multilevel_roi_align``) lowers to one giant
random-access gather — ~4 taps × samples × rois HBM touches at ~10% effective
bandwidth. This kernel exploits two structural facts:

1. After FPN level assignment every RoI spans a *bounded* window of its level
   (canonical mapper: ``sqrt(area)/stride ∈ [14, 28)``), so a fixed-size window
   slice covers all sampling taps;
2. RoIAlign's sample grid is axis-aligned, so bilinear interpolation factorizes
   into ``Wy @ window @ Wx^T`` — two small matmuls on the MXU with interpolation
   weights precomputed as dense (2-non-zero) matrices.

Layout: grid = (B, R) with RoI fastest; each program reads the four level maps as
per-image VMEM blocks (re-used across the R programs of an image), selects its
RoI's level branch, slices the window with dynamic starts, and runs the two
matmuls. Per-RoI scalars (level, window starts) ride scalar prefetch; the
interpolation weight matrices are regular VMEM inputs.

Semantics match torchvision RoIAlign (aligned=False, sampling_ratio fixed) up to
the window clamp: taps are guaranteed in-window for level-assigned RoIs with
aspect ≤ ~5; wilder RoIs clamp to the window edge (the XLA path remains the
reference implementation and the CPU fallback).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sample_positions(lo, span, n_bins, ratio, n_samples, limit):
    """torchvision sample coords for one axis: y = lo + (i + (p+.5)/r)·bin."""
    bin_size = span / n_bins
    i = jnp.arange(n_samples) // ratio
    p = jnp.arange(n_samples) % ratio
    pos = lo[..., None] + (i + (p + 0.5) / ratio)[None, :] * bin_size[..., None]
    # torchvision oob/edge rules
    oob = (pos <= -1.0) | (pos >= limit[..., None])
    posc = jnp.clip(pos, 0.0, None)
    t0 = jnp.floor(posc)
    edge = t0 >= limit[..., None] - 1
    t0 = jnp.where(edge, limit[..., None] - 1, t0)
    frac = jnp.where(edge, 0.0, posc - t0)
    frac = jnp.where(oob, 0.0, frac)  # oob handled by zero weight below
    weight_scale = jnp.where(oob, 0.0, 1.0)
    return t0.astype(jnp.int32), frac, weight_scale




def _window_sizes(heights, widths):
    """Per-level window sizes (see multilevel_roi_align_pallas docstring)."""
    w0ys = [min(40, h) for h in heights]
    w0xs = [w if w <= 56 else 48 for w in widths]
    return w0ys, w0xs


def _roi_params(rois, heights, widths, strides, w0ys, w0xs, w0y_max, w0x_max,
                oh, ow, s, sy_n, sx_n, canonical_scale, canonical_level,
                min_level, max_level):
    """Interpolation weights + window scalars for every RoI (float32)."""
    from .roi_align import roi_levels

    rois_f = rois.astype(jnp.float32)
    lvl = roi_levels(rois_f, min_level, max_level, canonical_scale,
                     canonical_level)

    scales = jnp.asarray([1.0 / st for st in strides], jnp.float32)[lvl]
    Hf = jnp.asarray(heights, jnp.float32)[lvl]
    Wf = jnp.asarray(widths, jnp.float32)[lvl]
    w0y_per = jnp.asarray(w0ys, jnp.int32)[lvl]
    w0x_per = jnp.asarray(w0xs, jnp.int32)[lvl]
    # x windows narrower than the level row use 8-aligned dynamic starts;
    # full-row windows pin the start to 0 (static slice in-kernel)
    x_dynamic = jnp.asarray(
        [1 if w > w0 else 0 for w, w0 in zip(widths, w0xs)], jnp.int32
    )[lvl]

    b = rois_f * scales[:, None]
    x1, y1 = b[:, 0], b[:, 1]
    roi_w = jnp.maximum(b[:, 2] - b[:, 0], 1.0)
    roi_h = jnp.maximum(b[:, 3] - b[:, 1], 1.0)

    ty, fy, wy_scale = _sample_positions(y1, roi_h, oh, s, sy_n, Hf)
    tx, fx, wx_scale = _sample_positions(x1, roi_w, ow, s, sx_n, Wf)

    y_start = jnp.clip(ty[:, 0], 0, jnp.maximum(
        jnp.asarray(heights, jnp.int32)[lvl] - w0y_per, 0))
    x_start_raw = jnp.clip(tx[:, 0], 0, jnp.maximum(
        jnp.asarray(widths, jnp.int32)[lvl] - w0x_per, 0))
    x_start = jnp.where(x_dynamic > 0, (x_start_raw // 8) * 8, 0)

    # dense interpolation weights relative to the window
    cols_y = jnp.arange(w0y_max)[None, None, :]
    rel_y = jnp.clip(ty - y_start[:, None], 0, w0y_per[:, None] - 1)
    rel_y1 = jnp.clip(ty + 1 - y_start[:, None], 0, w0y_per[:, None] - 1)
    Wy = ((cols_y == rel_y[:, :, None]) * ((1.0 - fy) * wy_scale)[:, :, None]
          + (cols_y == rel_y1[:, :, None]) * (fy * wy_scale)[:, :, None])
    cols_x = jnp.arange(w0x_max)[None, None, :]
    rel_x = jnp.clip(tx - x_start[:, None], 0, w0x_per[:, None] - 1)
    rel_x1 = jnp.clip(tx + 1 - x_start[:, None], 0, w0x_per[:, None] - 1)
    Wx = ((cols_x == rel_x[:, :, None]) * ((1.0 - fx) * wx_scale)[:, :, None]
          + (cols_x == rel_x1[:, :, None]) * (fx * wx_scale)[:, :, None])
    # NOTE: when a tap's two positions collide after clamping (edge rule), the
    # weights sum on the same column, preserving totals.

    # 1-D prefetch arrays: a (K, 3) array would be lane-padded to (K, 128)
    # in SMEM and overflow its 1 MB at a few thousand RoIs
    return (Wy.astype(jnp.float32), Wx.astype(jnp.float32),
            lvl.astype(jnp.int32), y_start.astype(jnp.int32),
            x_start.astype(jnp.int32))


def multilevel_roi_align_pallas(
    features: list[jnp.ndarray],
    rois: jnp.ndarray,
    roi_batch_idx: jnp.ndarray,
    output_size: tuple[int, int],
    strides: tuple[int, ...],
    sampling_ratio: int = 2,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    min_level: int = 2,
    max_level: int = 5,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Drop-in for ``multilevel_roi_align`` (same args) via the Pallas kernel.

    Constraint: ``roi_batch_idx`` must be block-contiguous — roi ``r`` of image
    ``b`` at flat position ``b * R + r`` (true for all callers, which reshape
    ``(B, R, 4)``).

    ``compute_dtype``: feature/weight dtype inside the kernel (f32 accumulate).
    bfloat16 keeps the per-image level blocks + double buffering within the
    16 MB VMEM budget; pass float32 for exact-parity testing at small sizes.
    """
    oh, ow = output_size
    s = sampling_ratio
    n_levels = len(features)
    B = features[0].shape[0]
    C = features[0].shape[-1]
    K = rois.shape[0]
    R = K // B
    sy_n, sx_n = oh * s, ow * s

    heights = [f.shape[1] for f in features]
    widths = [f.shape[2] for f in features]
    # per-level window sizes. The canonical level mapper bounds an assigned
    # RoI's span to < 28·sqrt(aspect) feature px, so 40 rows cover aspects to
    # ~2; x adds 8 for the alignment round-down. y (dim 1) allows arbitrary
    # dynamic starts; x (dim 2) is the sublane dimension — Mosaic requires
    # 8-aligned starts — so x windows widen by 8 or use the full row when the
    # level is small. Wilder aspect ratios clamp at the window edge.
    w0ys, w0xs = _window_sizes(heights, widths)
    w0y_max = max(w0ys)
    w0x_max = max(w0xs)

    Wy, Wx, lvl_arr, ys_arr, xs_arr = _roi_params(
        rois, heights, widths, strides, w0ys, w0xs, w0y_max, w0x_max,
        oh, ow, s, sy_n, sx_n, canonical_scale, canonical_level,
        min_level, max_level,
    )
    Wy = Wy.astype(compute_dtype)  # (K, sy_n, w0y_max)
    Wx = Wx.astype(compute_dtype)  # (K, sx_n, w0x_max)

    # RoIs per program: each program has a fixed ~3.6 µs floor (setup + block
    # seams), so chunking several RoIs into one program amortizes it. The
    # @pl.when level branch is a REAL branch when its condition is a
    # scalar-prefetch SMEM read (measured via the warp kernel's chunk-skip:
    # one active chunk runs ~1/3 the all-active cost), so each RoI in the
    # chunk pays only its own level's matmuls. Level blocks are re-used
    # across a whole image's programs (their index map ignores the chunk
    # index). The chunk size is capped by the out-block VMEM budget (the
    # (CH, sy_n, sx_n·C) f32 block is double-buffered).
    out_block_bytes = 2 * sy_n * sx_n * C * 4
    CH = 1
    for cand in (8, 4, 2):
        if R % cand == 0 and cand * out_block_bytes <= 4 * 1024 * 1024:
            CH = cand
            break
    pad_r = (-R) % CH
    if pad_r:
        Wy = Wy.reshape(B, R, sy_n, w0y_max)
        Wx = Wx.reshape(B, R, sx_n, w0x_max)
        Wy = jnp.pad(Wy, ((0, 0), (0, pad_r), (0, 0), (0, 0)))
        Wx = jnp.pad(Wx, ((0, 0), (0, pad_r), (0, 0), (0, 0)))
        Wy = Wy.reshape(B * (R + pad_r), sy_n, w0y_max)
        Wx = Wx.reshape(B * (R + pad_r), sx_n, w0x_max)
        lvl_arr = jnp.pad(lvl_arr.reshape(B, R), ((0, 0), (0, pad_r))).reshape(-1)
        ys_arr = jnp.pad(ys_arr.reshape(B, R), ((0, 0), (0, pad_r))).reshape(-1)
        xs_arr = jnp.pad(xs_arr.reshape(B, R), ((0, 0), (0, pad_r))).reshape(-1)
    Rp = R + pad_r
    n_chunks = Rp // CH
    Wy = Wy.reshape(B * n_chunks, CH, sy_n, w0y_max)
    Wx = Wx.reshape(B * n_chunks, CH, sx_n, w0x_max)

    kernel = functools.partial(
        _roi_kernel, n_levels=n_levels, w0ys=tuple(w0ys), w0xs=tuple(w0xs),
        widths=tuple(widths), sy_n=sy_n, sx_n=sx_n, C=C, Rp=Rp, CH=CH,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, n_chunks),
        in_specs=[
            *[
                pl.BlockSpec(
                    (1, features[i].shape[1], features[i].shape[2], C),
                    (lambda bi, ci, *_: (bi, 0, 0, 0)),
                    memory_space=pltpu.VMEM,
                )
                for i in range(n_levels)
            ],
            pl.BlockSpec((1, CH, sy_n, w0y_max),
                         lambda bi, ci, *_: (bi * n_chunks + ci, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH, sx_n, w0x_max),
                         lambda bi, ci, *_: (bi * n_chunks + ci, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, CH, sy_n, sx_n * C),
            lambda bi, ci, *_: (bi * n_chunks + ci, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B * n_chunks, CH, sy_n, sx_n * C), jnp.float32
        ),
        interpret=interpret,
    )(lvl_arr, ys_arr, xs_arr,
      *[f.astype(compute_dtype) for f in features], Wy, Wx)

    out = out.reshape(B, Rp, sy_n, sx_n, C)[:, :R].reshape(K, sy_n, sx_n, C)
    return out.reshape(K, oh, s, ow, s, C).mean(axis=(2, 4))


def _roi_kernel(lvl_ref, ys_ref, xs_ref, *refs, n_levels, w0ys, w0xs, widths,
                sy_n, sx_n, C, Rp, CH):
    feat_refs = refs[:n_levels]
    wy_ref, wx_ref, out_ref = refs[n_levels], refs[n_levels + 1], refs[n_levels + 2]

    bi = pl.program_id(0)
    ci = pl.program_id(1)

    for j in range(CH):
        k_idx = bi * Rp + ci * CH + j
        lvl = lvl_ref[k_idx]
        ys = ys_ref[k_idx]
        xs = xs_ref[k_idx]
        wy = wy_ref[0, j]  # (sy_n, w0y_max)
        wx = wx_ref[0, j]  # (sx_n, w0x_max)

        for i in range(n_levels):
            @pl.when(lvl == i)
            def _(i=i, j=j, wy=wy, wx=wx, ys=ys, xs=xs):
                w0y, w0x = w0ys[i], w0xs[i]
                if widths[i] > w0x:
                    # dynamic 8-aligned x window (sublane-dim constraint)
                    xs8 = pl.multiple_of(xs, 8)
                    win = feat_refs[i][0, pl.ds(ys, w0y), pl.ds(xs8, w0x), :]
                else:
                    win = feat_refs[i][0, pl.ds(ys, w0y), :, :]
                a = jnp.dot(
                    wy[:, :w0y], win.reshape(w0y, w0x * C),
                    preferred_element_type=jnp.float32,
                ).reshape(sy_n, w0x, C)
                # out[y, x, c] = sum_w wx[x, w] * a[y, w, c]
                res = jax.lax.dot_general(
                    a, wx[:, :w0x],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (sy_n, C, sx_n)
                out_ref[0, j] = jnp.transpose(res, (0, 2, 1)).reshape(
                    sy_n, sx_n * C
                )


# --------------------------------------------------------------------------- #
# Backward (custom VJP): gradient w.r.t. features only (rois non-differentiable,
# matching torchvision's roi_align autograd).
# --------------------------------------------------------------------------- #


def _roi_bwd_level_kernel(lvl_ref, ys_ref, xs_ref, *refs, level, w0y, w0x,
                          full_width, sy_n, sx_n, C, Rp, CH, n_chunks):
    """Backward for ONE pyramid level.

    Accumulates into an explicit VMEM scratch (single-buffered by construction —
    pipelined output blocks get double-buffered and overflow VMEM for the p2
    level) and DMAs the finished per-image gradient to HBM on the image's last
    program. TPU grids run sequentially on the core, so the accumulation is
    race-free. ``CH`` RoIs ride each program to amortize the ~3.6 µs program
    floor (same result as the forward kernel's chunking: the ``@pl.when``
    level branch on a scalar-prefetch condition is a real branch).
    """
    g_ref, wy_ref, wx_ref, out_hbm, acc, sem = refs

    ci = pl.program_id(1)
    bi = pl.program_id(0)

    @pl.when(ci == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    for j in range(CH):
        k_idx = bi * Rp + ci * CH + j
        lvl = lvl_ref[k_idx]
        ys = ys_ref[k_idx]
        xs = xs_ref[k_idx]

        @pl.when(lvl == level)
        def _(j=j, ys=ys, xs=xs):
            g = g_ref[0, j]  # (sy_n, sx_n*C)
            wy = wy_ref[0, j]  # (sy_n, w0y_max)
            wx = wx_ref[0, j]  # (sx_n, w0x_max)
            # T[h, (x c)] = sum_y wy[y, h] * g[y, (x c)]
            t = jax.lax.dot_general(
                wy[:, :w0y], g,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(w0y, sx_n, C)
            # dwin[h, w, c] = sum_x wx[x, w] * T[h, x, c]
            dwin = jax.lax.dot_general(
                t, wx[:, :w0x],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (w0y, C, w0x)
            dwin = jnp.transpose(dwin, (0, 2, 1))  # (w0y, w0x, C)
            if full_width:
                # the scratch may be w-padded to an 8 multiple for the HBM DMA
                cur = acc[pl.ds(ys, w0y), :w0x, :]
                acc[pl.ds(ys, w0y), :w0x, :] = cur + dwin
            else:
                xs8 = pl.multiple_of(xs, 8)
                cur = acc[pl.ds(ys, w0y), pl.ds(xs8, w0x), :]
                acc[pl.ds(ys, w0y), pl.ds(xs8, w0x), :] = cur + dwin

    @pl.when(ci == n_chunks - 1)
    def _():
        copy = pltpu.make_async_copy(acc, out_hbm.at[bi], sem)
        copy.start()
        copy.wait()


# --------------------------------------------------------------------------- #
# Differentiable wrapper
# --------------------------------------------------------------------------- #


def _roi_backward(g, rois, feat_shapes, output_size, strides, sampling_ratio,
                  canonical_scale, canonical_level, min_level, max_level,
                  interpret, compute_dtype=jnp.bfloat16):
    """Gradient w.r.t. the feature pyramid for the Pallas RoIAlign forward."""
    oh, ow = output_size
    s = sampling_ratio
    sy_n, sx_n = oh * s, ow * s
    n_levels = len(feat_shapes)
    B, _, _, C = feat_shapes[0]
    K = rois.shape[0]
    R = K // B
    heights = [fs[1] for fs in feat_shapes]
    widths = [fs[2] for fs in feat_shapes]
    w0ys, w0xs = _window_sizes(heights, widths)
    w0y_max, w0x_max = max(w0ys), max(w0xs)

    Wy, Wx, lvl_arr, ys_arr, xs_arr = _roi_params(
        rois, heights, widths, strides, w0ys, w0xs, w0y_max, w0x_max,
        oh, ow, s, sy_n, sx_n, canonical_scale, canonical_level,
        min_level, max_level,
    )

    # mean-pool backward: spread the pooled cotangent over the s×s samples.
    # Streamed operands ride in bf16 (f32 accumulation in-kernel): the f32
    # per-image gradient blocks alone fill ~9 MB of VMEM and the f32 variant
    # overflows the 16 MB budget by a hair.
    # RoIs per program (amortizes the program floor; see the forward kernel).
    # The per-RoI cotangent block dominates the budget: (CH, sy_n, sx_n·C)
    # in compute_dtype, double-buffered.
    g_block_bytes = 2 * sy_n * sx_n * C * jnp.dtype(compute_dtype).itemsize
    CH = 1
    for cand in (8, 4, 2):
        if R % cand == 0 and cand * g_block_bytes <= 2 * 1024 * 1024:
            CH = cand
            break
    n_chunks = R // CH

    g_s = jnp.repeat(jnp.repeat(g.reshape(K, oh, 1, ow, 1, C), s, axis=2),
                     s, axis=4) / float(s * s)
    g_s = g_s.reshape(B * n_chunks, CH, sy_n, sx_n * C).astype(compute_dtype)
    Wy = Wy.reshape(B * n_chunks, CH, sy_n, w0y_max).astype(compute_dtype)
    Wx = Wx.reshape(B * n_chunks, CH, sx_n, w0x_max).astype(compute_dtype)

    grads = []
    for i in range(n_levels):
        # pad W to a multiple of 8: the scratch->HBM DMA slices must be
        # sublane-tile aligned
        wp = ((widths[i] + 7) // 8) * 8
        kernel = functools.partial(
            _roi_bwd_level_kernel, level=i, w0y=w0ys[i], w0x=w0xs[i],
            full_width=widths[i] <= w0xs[i], sy_n=sy_n, sx_n=sx_n, C=C, Rp=R,
            CH=CH, n_chunks=n_chunks,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, n_chunks),
            in_specs=[
                pl.BlockSpec((1, CH, sy_n, sx_n * C),
                             lambda bi, ci, *_: (bi * n_chunks + ci, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CH, sy_n, w0y_max),
                             lambda bi, ci, *_: (bi * n_chunks + ci, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CH, sx_n, w0x_max),
                             lambda bi, ci, *_: (bi * n_chunks + ci, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((heights[i], wp, C), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        padded = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (B, heights[i], wp, C), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(lvl_arr, ys_arr, xs_arr, g_s, Wy, Wx)
        grads.append(padded[:, :, : widths[i], :])
    return tuple(grads)


@functools.lru_cache(maxsize=None)
def _make_diff_roi_align(feat_shapes, output_size, strides, sampling_ratio,
                         canonical_scale, canonical_level, min_level,
                         max_level, interpret, compute_dtype_name,
                         feat_dtype_names=None):
    compute_dtype = jnp.dtype(compute_dtype_name)

    @jax.custom_vjp
    def fn(features, rois, roi_batch_idx):
        return multilevel_roi_align_pallas(
            list(features), rois, roi_batch_idx, output_size, strides,
            sampling_ratio, canonical_scale, canonical_level, min_level,
            max_level, interpret, compute_dtype,
        )

    def fwd(features, rois, roi_batch_idx):
        out = fn(features, rois, roi_batch_idx)
        return out, (rois, roi_batch_idx)

    def bwd(res, g):
        rois, roi_batch_idx = res
        dfeat = _roi_backward(
            g, rois, feat_shapes, output_size, strides, sampling_ratio,
            canonical_scale, canonical_level, min_level, max_level, interpret,
            compute_dtype,
        )
        import numpy as _np

        from jax import dtypes as _dtypes

        if feat_dtype_names is not None:
            # cotangent dtype must match each primal feature's dtype (the
            # backward kernel always produces float32 blocks)
            dfeat = tuple(
                d.astype(jnp.dtype(n)) for d, n in zip(dfeat, feat_dtype_names)
            )
        zero_rois = jnp.zeros_like(rois)
        zero_idx = _np.zeros(roi_batch_idx.shape, _dtypes.float0)
        return dfeat, zero_rois, zero_idx

    fn.defvjp(fwd, bwd)
    return fn


def multilevel_roi_align_pallas_diff(
    features: list[jnp.ndarray],
    rois: jnp.ndarray,
    roi_batch_idx: jnp.ndarray,
    output_size: tuple[int, int],
    strides: tuple[int, ...],
    sampling_ratio: int = 2,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    min_level: int = 2,
    max_level: int = 5,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Differentiable Pallas RoIAlign: forward kernel + custom-VJP backward
    kernel (gradient w.r.t. features only — rois are non-differentiable, as in
    torchvision's autograd).

    The backward scatter-accumulates each RoI's ``Wyᵀ @ g @ Wx`` window into
    per-level, per-image gradient blocks; TPU pallas grids execute sequentially
    per core, so revisited output blocks accumulate race-free.
    """
    feat_shapes = tuple(tuple(f.shape) for f in features)
    fn = _make_diff_roi_align(
        feat_shapes, tuple(output_size), tuple(strides), sampling_ratio,
        canonical_scale, canonical_level, min_level, max_level, interpret,
        jnp.dtype(compute_dtype).name,
        tuple(jnp.dtype(f.dtype).name for f in features),
    )
    return fn(tuple(features), rois, roi_batch_idx)
