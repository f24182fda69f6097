"""RoIAlign (bilinear region pooling) — NHWC, static-shape.

Replaces torchvision's C++/CUDA ``roi_align`` used by every reference R-CNN RoI head
(SURVEY.md §2.10). Numerics follow torchvision's kernel exactly (half-open bilinear
with the ``<= -1 / >= size`` zero-padding rule and the ``aligned`` half-pixel option),
so converted checkpoints reproduce reference detections.

TPU design notes:
- features are NHWC (channel-last = lane dimension);
- every RoI produces a fixed ``(oh, ow)`` grid with a fixed ``sampling_ratio``, so the
  whole op is one big XLA gather + mean — no per-RoI control flow;
- invalid/padding RoIs are fine: they just sample garbage that callers mask out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather(features: jnp.ndarray, batch_idx, y, x):
    """Sample ``features (B,H,W,C)`` at float coords ``y, x`` (any shape ``S``).

    Returns ``(*S, C)``. Out-of-range coords (torchvision rule: ``y <= -1`` or
    ``y >= H``) contribute zero.
    """
    B, H, W, C = features.shape
    oob = (y <= -1.0) | (y >= H) | (x <= -1.0) | (x >= W)
    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)

    y_low = jnp.floor(y).astype(jnp.int32)
    x_low = jnp.floor(x).astype(jnp.int32)
    # torchvision: at the top edge collapse to the last row and zero fractional part.
    y_edge = y_low >= H - 1
    x_edge = x_low >= W - 1
    y_low = jnp.where(y_edge, H - 1, y_low)
    x_low = jnp.where(x_edge, W - 1, x_low)
    y_high = jnp.where(y_edge, H - 1, y_low + 1)
    x_high = jnp.where(x_edge, W - 1, x_low + 1)
    ly = jnp.where(y_edge, 0.0, y - y_low.astype(y.dtype))
    lx = jnp.where(x_edge, 0.0, x - x_low.astype(x.dtype))
    hy, hx = 1.0 - ly, 1.0 - lx

    flat = features.reshape(B * H * W, C)

    def take(yy, xx):
        idx = (batch_idx * H + yy) * W + xx
        return flat[idx.reshape(-1)].reshape(*idx.shape, C)

    val = (
        take(y_low, x_low) * (hy * hx)[..., None]
        + take(y_low, x_high) * (hy * lx)[..., None]
        + take(y_high, x_low) * (ly * hx)[..., None]
        + take(y_high, x_high) * (ly * lx)[..., None]
    )
    return jnp.where(oob[..., None], 0.0, val)


def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    roi_batch_idx: jnp.ndarray,
    output_size: tuple[int, int],
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = False,
) -> jnp.ndarray:
    """RoIAlign over NHWC features.

    Args:
      features: ``(B, H, W, C)``.
      rois: ``(K, 4)`` xyxy boxes in *image* coordinates.
      roi_batch_idx: ``(K,)`` int32 image index per RoI.
      output_size: ``(oh, ow)`` pooled grid.
      spatial_scale: feature-stride reciprocal (e.g. 1/16).
      sampling_ratio: samples per output-cell side (torchvision detection uses 2; if
        <= 0 torchvision derives it from the roi size — unsupported here, pass it).
      aligned: subtract 0.5 after scaling (torchvision ``aligned=True`` convention).

    Returns:
      ``(K, oh, ow, C)`` pooled features, float32.
    """
    assert sampling_ratio >= 1, "static shapes require an explicit sampling_ratio"
    oh, ow = output_size
    s = sampling_ratio
    offset = 0.5 if aligned else 0.0

    rois = rois.astype(jnp.float32) * spatial_scale - offset
    x1, y1, x2, y2 = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:  # torchvision: force malformed rois to size >= 1
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    bin_h = roi_h / oh  # (K,)
    bin_w = roi_w / ow

    # Sample grid: for output cell (i,j), sample points at
    # y1 + (i + (p + .5)/s) * bin_h for p in [0, s)
    iy = (jnp.arange(oh)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
    ix = (jnp.arange(ow)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
    ys = y1[:, None] + iy[None, :] * bin_h[:, None]  # (K, oh*s)
    xs = x1[:, None] + ix[None, :] * bin_w[:, None]  # (K, ow*s)

    yy = jnp.broadcast_to(ys[:, :, None], (rois.shape[0], oh * s, ow * s))
    xx = jnp.broadcast_to(xs[:, None, :], (rois.shape[0], oh * s, ow * s))
    bb = jnp.broadcast_to(
        roi_batch_idx.astype(jnp.int32)[:, None, None], yy.shape
    )

    samples = _bilinear_gather(features.astype(jnp.float32), bb, yy, xx)
    K, _, _, C = samples.shape
    samples = samples.reshape(K, oh, s, ow, s, C)
    return samples.mean(axis=(2, 4))


def roi_levels(
    rois: jnp.ndarray,
    min_level: int,
    max_level: int,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN level index (0-based from ``min_level``) per RoI.

    Exact torchvision ``LevelMapper`` numerics: ``floor(k0 + log2(sqrt(area) /
    224) + eps)`` with eps=1e-6 added OUTSIDE the log2 (it snaps exact
    power-of-two boundary sizes up a level; degenerate zero-area boxes give
    ``log2(0) = -inf`` which clamps to ``min_level``, as in torchvision).
    """
    rois = rois.astype(jnp.float32)
    area = jnp.clip(rois[:, 2] - rois[:, 0], 0) * jnp.clip(
        rois[:, 3] - rois[:, 1], 0
    )
    lvl = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(area) / canonical_scale) + 1e-6
    )
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32) - min_level


def _interp_weights(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """One-hot bilinear row weights: ``coords (K, n) -> (K, n, size)``.

    Exact torchvision edge rules (clamp-to-last-row with zero fraction;
    ``<= -1`` / ``>= size`` rows are all-zero) — the weight-matrix form of
    ``_bilinear_gather`` along a single axis.
    """
    oob = (coords <= -1.0) | (coords >= size)
    c = jnp.clip(coords, 0.0, None)
    low = jnp.floor(c).astype(jnp.int32)
    edge = low >= size - 1
    low = jnp.where(edge, size - 1, low)
    high = jnp.where(edge, low, low + 1)
    lf = jnp.where(edge, 0.0, c - low.astype(jnp.float32))
    grid = jnp.arange(size, dtype=jnp.int32)
    w = ((grid == low[..., None]) * (1.0 - lf)[..., None]
         + (grid == high[..., None]) * lf[..., None])
    return jnp.where(oob[..., None], 0.0, w)


def multilevel_roi_align_dense(
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
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Gather-free multilevel RoIAlign: whole levels × interpolation matmuls.

    Same semantics as :func:`multilevel_roi_align`, computed as
    ``out_k = Wy_k @ level @ Wx_kᵀ`` batched einsums over the *entire* level
    maps, with per-level one-hot weights masked by the RoI's assigned level.
    The ``s × s`` sample mean is folded into the weights (bilinear sampling is
    linear and separable, so the fold is exact up to float association).

    TPU gathers run at ~10% of HBM bandwidth; this form is all MXU matmuls.
    It wins when the pyramid is small relative to the RoI count — e.g. the
    serving detectors' 2-level FPNs (p4/p5 at 320px input are 20×20/10×10),
    where the Pallas windowed kernel is program-overhead-bound (~3.6 µs/RoI).

    Requires ``roi_batch_idx`` block-contiguous image-major (i.e. rois are a
    reshaped ``(B, R, 4)``) — true for every R-CNN call site.
    """
    oh, ow = output_size
    s = sampling_ratio
    B, _, _, C = features[0].shape
    K = rois.shape[0]
    R = K // B
    assert R * B == K, "dense RoIAlign requires K divisible by B"

    rois = rois.astype(jnp.float32)
    lvl = roi_levels(rois, min_level, max_level, canonical_scale,
                     canonical_level)

    iy = (jnp.arange(oh)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
    ix = (jnp.arange(ow)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)

    # One sampling matrix over the level-flattened cell axis (last = lane dim,
    # so the one-hot construction never lays out a 20-wide lane): per level,
    # M[k, ij, h·W+w] = Wy[k, i, h] · Wx[k, j, w], zero outside the RoI's
    # assigned level. Pooling is then ONE einsum with a P-sized contraction —
    # separable per-level einsums measured 3.7x slower here (contraction dims
    # of 10-20 leave the MXU at ~15%).
    ms = []
    for li, (f, stride) in enumerate(zip(features, strides)):
        H, W = f.shape[1], f.shape[2]
        boxes = rois / float(stride)
        x1, y1 = boxes[:, 0], boxes[:, 1]
        roi_w = jnp.maximum(boxes[:, 2] - x1, 1.0)
        roi_h = jnp.maximum(boxes[:, 3] - y1, 1.0)
        ys = y1[:, None] + iy[None, :] * (roi_h / oh)[:, None]  # (K, oh*s)
        xs = x1[:, None] + ix[None, :] * (roi_w / ow)[:, None]
        wy = _interp_weights(ys, H).reshape(K, oh, s, H).mean(axis=2)
        wx = _interp_weights(xs, W).reshape(K, ow, s, W).mean(axis=2)
        wy = wy * (lvl == li).astype(jnp.float32)[:, None, None]

        wy_f = jnp.broadcast_to(
            wy[:, :, :, None], (K, oh, H, W)
        ).reshape(K, oh, 1, H * W)
        wx_f = jnp.broadcast_to(
            wx[:, :, None, :], (K, ow, H, W)
        ).reshape(K, 1, ow, H * W)
        ms.append((wy_f * wx_f).reshape(K, oh * ow, H * W).astype(compute_dtype))

    m = jnp.concatenate(ms, axis=-1)  # (K, oh·ow, P)
    fflat = jnp.concatenate(
        [f.reshape(B, -1, C) for f in features], axis=1
    ).astype(compute_dtype)  # (B, P, C)
    out = jnp.einsum(
        "bkm,bmc->bkc",
        m.reshape(B, R * oh * ow, -1),
        fflat,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(K, oh, ow, C)


def multilevel_roi_align_separable(
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
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Separable gather-free multilevel RoIAlign: ``Wy @ level @ Wxᵀ``.

    Same numbers as :func:`multilevel_roi_align` via per-axis interpolation
    matmuls (bilinear sampling factorizes exactly — the round-5 mask-target
    projection trick, models/roi_heads.py). Unlike
    :func:`multilevel_roi_align_dense`, the joint ``(K, oh·ow, ΣHW)``
    sampling matrix is never built, so it scales to TRAINING pyramids
    (p2 at 80×80: the dense form needs GBs, this needs ``(K·oh, B·H)`` and
    ``(K·oh, W·C)`` intermediates). Being plain einsums it is exactly
    differentiable by XLA autodiff — the training-path alternative to the
    Pallas custom-VJP kernel (measured round-5: the Pallas fwd+bwd pair is
    scratch/DMA-bound at 2048 RoIs × 5 levels).

    The per-image selection folds into the row weights (``wy ×
    one_hot(batch)``), making the row contraction ONE ``(K·oh, B·H) @
    (B·H, W·C)`` matmul per level — no per-RoI feature materialization.
    """
    oh, ow = output_size
    s = sampling_ratio
    B, _, _, C = features[0].shape
    K = rois.shape[0]

    rois = rois.astype(jnp.float32)
    lvl = roi_levels(rois, min_level, max_level, canonical_scale,
                     canonical_level)
    onehot_b = jax.nn.one_hot(roi_batch_idx, B, dtype=jnp.float32)  # (K, B)

    iy = (jnp.arange(oh)[:, None]
          + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
    ix = (jnp.arange(ow)[:, None]
          + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)

    out = jnp.zeros((K, oh, ow, C), jnp.float32)
    for li, (f, stride) in enumerate(zip(features, strides)):
        H, W = f.shape[1], f.shape[2]
        boxes = rois / float(stride)
        x1, y1 = boxes[:, 0], boxes[:, 1]
        roi_w = jnp.maximum(boxes[:, 2] - x1, 1.0)
        roi_h = jnp.maximum(boxes[:, 3] - y1, 1.0)
        ys = y1[:, None] + iy[None, :] * (roi_h / oh)[:, None]
        xs = x1[:, None] + ix[None, :] * (roi_w / ow)[:, None]
        wy = _interp_weights(ys, H).reshape(K, oh, s, H).mean(axis=2)
        wx = _interp_weights(xs, W).reshape(K, ow, s, W).mean(axis=2)
        wy = wy * (lvl == li).astype(jnp.float32)[:, None, None]
        # fold the image one-hot into the row weights: (K, oh, B, H)
        wyb = (wy[:, :, None, :] * onehot_b[:, :, None][:, None]
               ).reshape(K * oh, B * H)
        rows = jax.lax.dot_general(
            wyb.astype(compute_dtype),
            f.reshape(B * H, W * C).astype(compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(K, oh, W, C)
        out = out + jnp.einsum(
            "kiwc,kjw->kijc", rows.astype(compute_dtype),
            wx.astype(compute_dtype), preferred_element_type=jnp.float32)
    return out


def multilevel_roi_align(
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
) -> jnp.ndarray:
    """FPN-aware RoIAlign (torchvision ``MultiScaleRoIAlign`` semantics).

    Each RoI is assigned to pyramid level ``floor(k0 + log2(sqrt(area)/224))``
    clamped to ``[min_level, max_level]`` and pooled from that level only. To stay
    static-shape and single-kernel, all levels are flattened into one ``(B, P, C)``
    buffer and the bilinear gather indexes it with per-RoI level offsets — one XLA
    gather for the whole batch instead of torchvision's per-level loop.

    Args:
      features: list of ``(B, H_l, W_l, C)`` NHWC maps ordered ``p2..p5``.
      strides: image-to-feature stride per level, e.g. ``(4, 8, 16, 32)``.
    """
    oh, ow = output_size
    s = sampling_ratio
    B, _, _, C = features[0].shape
    K = rois.shape[0]

    sizes = [(f.shape[1], f.shape[2]) for f in features]
    flat = jnp.concatenate([f.reshape(B, -1, C) for f in features], axis=1)
    offsets, off = [], 0
    for h, w in sizes:
        offsets.append(off)
        off += h * w
    P = off

    hs = jnp.asarray([h for h, _ in sizes], jnp.int32)
    ws = jnp.asarray([w for _, w in sizes], jnp.int32)
    offs = jnp.asarray(offsets, jnp.int32)
    scales = jnp.asarray([1.0 / st for st in strides], jnp.float32)

    # level assignment (torchvision LevelMapper numerics)
    rois = rois.astype(jnp.float32)
    lvl = roi_levels(rois, min_level, max_level, canonical_scale,
                     canonical_level)

    scale = scales[lvl]  # (K,)
    H = hs[lvl]
    W = ws[lvl]
    base = offs[lvl]

    boxes = rois * scale[:, None]
    x1, y1 = boxes[:, 0], boxes[:, 1]
    roi_w = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1.0)
    roi_h = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1.0)
    bin_h = roi_h / oh
    bin_w = roi_w / ow

    iy = (jnp.arange(oh)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
    ix = (jnp.arange(ow)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
    ys = y1[:, None] + iy[None, :] * bin_h[:, None]  # (K, oh*s)
    xs = x1[:, None] + ix[None, :] * bin_w[:, None]

    yy = jnp.broadcast_to(ys[:, :, None], (K, oh * s, ow * s))
    xx = jnp.broadcast_to(xs[:, None, :], (K, oh * s, ow * s))
    Hf = H.astype(jnp.float32)[:, None, None]
    Wf = W.astype(jnp.float32)[:, None, None]

    oob = (yy <= -1.0) | (yy >= Hf) | (xx <= -1.0) | (xx >= Wf)
    yyc = jnp.clip(yy, 0.0, None)
    xxc = jnp.clip(xx, 0.0, None)
    y_low = jnp.floor(yyc).astype(jnp.int32)
    x_low = jnp.floor(xxc).astype(jnp.int32)
    y_edge = y_low >= (H[:, None, None] - 1)
    x_edge = x_low >= (W[:, None, None] - 1)
    y_low = jnp.where(y_edge, H[:, None, None] - 1, y_low)
    x_low = jnp.where(x_edge, W[:, None, None] - 1, x_low)
    y_high = jnp.where(y_edge, y_low, y_low + 1)
    x_high = jnp.where(x_edge, x_low, x_low + 1)
    ly = jnp.where(y_edge, 0.0, yyc - y_low.astype(jnp.float32))
    lx = jnp.where(x_edge, 0.0, xxc - x_low.astype(jnp.float32))
    hy, hx = 1.0 - ly, 1.0 - lx

    big = flat.reshape(B * P, C)
    bidx = roi_batch_idx.astype(jnp.int32)[:, None, None]

    def take(yyi, xxi):
        idx = bidx * P + base[:, None, None] + yyi * W[:, None, None] + xxi
        return big[idx.reshape(-1)].reshape(K, oh * s, ow * s, C)

    val = (
        take(y_low, x_low) * (hy * hx)[..., None]
        + take(y_low, x_high) * (hy * lx)[..., None]
        + take(y_high, x_low) * (ly * hx)[..., None]
        + take(y_high, x_high) * (ly * lx)[..., None]
    )
    val = jnp.where(oob[..., None], 0.0, val)
    return val.reshape(K, oh, s, ow, s, C).mean(axis=(2, 4))
