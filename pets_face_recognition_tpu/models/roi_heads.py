"""RoI heads: box classification/regression, mask, keypoint — static-shape.

Replaces torchvision's ``RoIHeads`` (used implicitly by every reference R-CNN,
SURVEY.md §2.10): same matching thresholds, sampling ratios, box-coder weights
(10, 10, 5, 5), loss normalizations, and post-processing order so converted
checkpoints detect identically. Dynamic per-image structures become fixed budgets
(``num_samples`` proposals at train, ``detections_per_img`` at eval) with validity
masks.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..losses import cross_entropy, optax_sigmoid_ce, smooth_l1
from ..ops.boxes import clip_boxes, decode_boxes, encode_boxes, pairwise_iou
from ..ops.nms import batched_nms
from ..ops.roi_align import multilevel_roi_align, roi_align
from .rpn import sample_balanced

BOX_CODER_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


# --------------------------------------------------------------------------- #
# Head modules (torchvision architecture for checkpoint compatibility)
# --------------------------------------------------------------------------- #


class TwoMLPHead(nn.Module):
    """flatten → fc(1024) → fc(1024) (torchvision TwoMLPHead)."""

    representation_size: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                             name="fc6")(x))
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                             name="fc7")(x))
        return x


class FastRCNNPredictor(nn.Module):
    """cls_score (C) + bbox_pred (4C), C including background."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=jnp.float32,
                          name="bbox_pred")(x)
        return scores, deltas.reshape(x.shape[0], self.num_classes, 4)


class MaskHead(nn.Module):
    """4×(conv3x3 256) → deconv2x → 1×1 conv per-class logits (torchvision
    MaskRCNNHeads + MaskRCNNPredictor)."""

    num_classes: int
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(4):
            x = nn.relu(
                nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"mask_fcn{i + 1}")(x)
            )
        # transpose_kernel=True + VALID == torch ConvTranspose2d(k=2, s=2, p=0)
        # exactly (kernel layout (kh, kw, out, in)) — verified numerically
        x = nn.relu(
            nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                             padding="VALID", transpose_kernel=True,
                             dtype=self.dtype, name="conv5_mask")(x)
        )
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="mask_fcn_logits")(x)


class KeypointHead(nn.Module):
    """8×(conv3x3 512) → deconv(4,2) → 2x bilinear upsample → K heatmaps
    (torchvision KeypointRCNNHeads + KeypointRCNNPredictor).

    ``quant`` (None | "calibrate" | "int8"): serving int8 PTQ for the conv
    chain (``models/quant.py``) — at serving budgets the 8×conv3x3@512 stack
    is ~0.9 TFLOP/batch, the largest single MXU consumer in the pipeline
    (PERF.md round 3). Each conv's dequant+relu+requant epilogue fuses, so
    inter-conv activations stay int8-resident; params tree unchanged
    (kernel+bias per conv → torchvision converters untouched). The deconv
    predictor stays float32: its output feeds the sub-pixel bicubic argmax
    refine directly.
    """

    num_keypoints: int
    channels: int = 512
    dtype: Any = jnp.float32
    quant: Any = None

    @nn.compact
    def __call__(self, x):
        if self.quant is not None:
            from .quant import ActQuant, QuantConv

            cal = self.quant == "calibrate"
            for i in range(8):
                xq, s = ActQuant(calibrate=cal, name=f"kps_q{i + 1}")(x)
                x = nn.relu(
                    QuantConv(self.channels, (3, 3),
                              padding=((1, 1), (1, 1)), dtype=self.dtype,
                              use_bias=True, calibrate=cal,
                              name=f"kps_fcn{i + 1}")(xq, s)
                )
        else:
            for i in range(8):
                x = nn.relu(
                    nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name=f"kps_fcn{i + 1}")(x)
                )
        # torch ConvTranspose2d(k=4, s=2, p=1) == flax padding (k-1-p)=2 with
        # transpose_kernel=True — verified numerically
        x = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             padding=((2, 2), (2, 2)), transpose_kernel=True,
                             dtype=jnp.float32,
                             name="kps_score_lowres")(x)
        return _upsample_bilinear_2x(x)


def _upsample_bilinear_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample with align_corners=False (torch interpolate default)."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")


# --------------------------------------------------------------------------- #
# Training: matching + sampling (torchvision RoIHeads.select_training_samples)
# --------------------------------------------------------------------------- #


def select_training_samples(
    proposals: jnp.ndarray,
    prop_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    rng: jax.Array,
    num_samples: int = 512,
    positive_fraction: float = 0.25,
    fg_iou_thresh: float = 0.5,
    bg_iou_thresh: float = 0.5,
):
    """Per-image proposal sampling for box-head training.

    GT boxes are appended to the proposal set first (torchvision
    ``add_gt_proposals``). Returns fixed-size ``(num_samples, ...)`` arrays:
    boxes, class labels (0 = background), matched GT index, sample validity,
    and positivity mask.
    """
    all_boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
    all_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)

    iou = pairwise_iou(all_boxes, gt_boxes)
    iou = jnp.where(gt_valid[None, :] & all_valid[:, None], iou, -1.0)
    best_iou = iou.max(axis=1)
    best_gt = iou.argmax(axis=1)

    # labels: fg -> gt class, bg -> 0, invalid proposals excluded
    is_fg = (best_iou >= fg_iou_thresh) & all_valid
    is_bg = (best_iou < bg_iou_thresh) & all_valid
    match_labels = jnp.where(is_fg, 1, jnp.where(is_bg, 0, -1))

    sampled = sample_balanced(match_labels, rng, num_samples, positive_fraction)
    # compress the sampled set into the first num_samples slots (score trick:
    # sampled entries first, positives before negatives is NOT required — keep
    # arbitrary order via ranking of sampled mask)
    order = jnp.argsort(-sampled - jnp.arange(sampled.shape[0]) * 1e-9)
    take = order[:num_samples]

    boxes = all_boxes[take]
    valid = sampled[take] > 0
    fg = is_fg[take] & valid
    cls = jnp.where(fg, gt_labels[best_gt[take]], 0)
    return boxes, cls, best_gt[take], valid, fg


def fastrcnn_loss(
    class_logits: jnp.ndarray,
    box_deltas: jnp.ndarray,
    sampled_boxes: jnp.ndarray,
    cls_targets: jnp.ndarray,
    matched_gt_boxes: jnp.ndarray,
    valid: jnp.ndarray,
    fg: jnp.ndarray,
) -> dict[str, jnp.ndarray]:
    """torchvision ``fastrcnn_loss``: CE over sampled, smooth-l1 (sum) / N_sampled."""
    n = jnp.maximum(valid.sum(), 1.0)
    cls_loss = cross_entropy(class_logits, cls_targets,
                             weights=valid.astype(jnp.float32))

    targets = encode_boxes(matched_gt_boxes, sampled_boxes, BOX_CODER_WEIGHTS)
    per_class_deltas = jnp.take_along_axis(
        box_deltas, cls_targets[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    reg = smooth_l1(per_class_deltas, targets).sum(-1)
    reg_loss = jnp.sum(reg * fg.astype(jnp.float32)) / n
    return {"loss_classifier": cls_loss, "loss_box_reg": reg_loss}


# --------------------------------------------------------------------------- #
# Inference post-processing (torchvision RoIHeads.postprocess_detections)
# --------------------------------------------------------------------------- #


def postprocess_detections_batch(
    class_logits: jnp.ndarray,
    box_deltas: jnp.ndarray,
    proposals: jnp.ndarray,
    prop_valid: jnp.ndarray,
    image_size: tuple[int, int],
    score_thresh: float = 0.05,
    nms_thresh: float = 0.5,
    detections_per_img: int = 100,
):
    """Batched detection decoding: all images' class-aware NMS runs as ONE
    Pallas kernel (groups in sublanes) instead of a vmapped sequential loop.

    Args are the batched forms: ``class_logits (B, N, C)``,
    ``box_deltas (B, N, C, 4)``, ``proposals (B, N, 4)``, ``prop_valid (B, N)``.
    Returns ``(boxes (B, D, 4), labels, scores, valid)``.
    """
    from ..ops.pallas_nms import nms_keep_sorted_batch

    B, N, C = class_logits.shape
    scores = jax.nn.softmax(class_logits, axis=-1)
    boxes = decode_boxes(box_deltas, proposals[:, :, None, :],
                         BOX_CODER_WEIGHTS)
    boxes = clip_boxes(boxes, image_size)  # (B, N, C, 4)

    fg_scores = scores[:, :, 1:].reshape(B, N * (C - 1))
    fg_boxes = boxes[:, :, 1:, :].reshape(B, N * (C - 1), 4)
    fg_labels = jnp.tile(jnp.arange(1, C), N)[None, :]  # (1, N*(C-1))
    fg_valid = jnp.repeat(prop_valid, C - 1, axis=1)

    w = fg_boxes[..., 2] - fg_boxes[..., 0]
    h = fg_boxes[..., 3] - fg_boxes[..., 1]
    fg_valid = fg_valid & (w >= 0.01) & (h >= 0.01) & (fg_scores > score_thresh)

    if detections_per_img == 1:
        # Exact fast path: greedy NMS never suppresses the highest-scored box,
        # so top-1-after-NMS == argmax over valid candidates (same tie-break:
        # argmax and the stable descending argsort both pick the lowest index).
        # Skips the sort + NMS kernel + 5 gathers — the serving detectors and
        # the production keypoint config all run box_detections_per_img=1
        # (ref models/detection/rcnn.py:19,117; keypoints_config.py:80).
        masked = jnp.where(fg_valid, fg_scores, -jnp.inf)
        top_i = jnp.argmax(masked, axis=1)  # (B,)
        top_s = jnp.take_along_axis(masked, top_i[:, None], axis=1)  # (B, 1)
        out_boxes = jnp.take_along_axis(fg_boxes, top_i[:, None, None], axis=1)
        out_labels = jnp.take_along_axis(
            jnp.broadcast_to(fg_labels, fg_scores.shape), top_i[:, None], axis=1)
        out_valid = top_s > -jnp.inf
        return (out_boxes, out_labels, jnp.where(out_valid, top_s, 0.0),
                out_valid)

    # class-offset trick so classes never suppress each other
    max_coord = float(max(image_size)) + 2.0
    shifted = fg_boxes + (
        fg_labels.astype(fg_boxes.dtype) * max_coord
    )[:, :, None]

    order = jnp.argsort(-jnp.where(fg_valid, fg_scores, -jnp.inf), axis=1)
    s_boxes = jnp.take_along_axis(shifted, order[..., None], axis=1)
    s_raw = jnp.take_along_axis(fg_boxes, order[..., None], axis=1)
    s_scores = jnp.take_along_axis(fg_scores, order, axis=1)
    s_labels = jnp.take_along_axis(
        jnp.broadcast_to(fg_labels, fg_scores.shape), order, axis=1)
    s_valid = jnp.take_along_axis(fg_valid, order, axis=1)

    keep = nms_keep_sorted_batch(s_boxes, s_valid, nms_thresh) > 0.0
    kept_scores = jnp.where(keep, s_scores, -jnp.inf)
    top_s, top_i = jax.lax.top_k(kept_scores, detections_per_img)
    out_boxes = jnp.take_along_axis(s_raw, top_i[..., None], axis=1)
    out_labels = jnp.take_along_axis(s_labels, top_i, axis=1)
    out_valid = top_s > -jnp.inf
    return out_boxes, out_labels, jnp.where(out_valid, top_s, 0.0), out_valid


def postprocess_detections(
    class_logits: jnp.ndarray,
    box_deltas: jnp.ndarray,
    proposals: jnp.ndarray,
    prop_valid: jnp.ndarray,
    image_size: tuple[int, int],
    score_thresh: float = 0.05,
    nms_thresh: float = 0.5,
    detections_per_img: int = 100,
):
    """Per-image detection decoding. All-class NMS with class offsets; returns
    ``(boxes (D, 4), labels (D,), scores (D,), valid (D,))``, D static."""
    num_classes = class_logits.shape[-1]
    scores = jax.nn.softmax(class_logits, axis=-1)  # (N, C)
    boxes = decode_boxes(box_deltas, proposals[:, None, :], BOX_CODER_WEIGHTS)
    boxes = clip_boxes(boxes, image_size)  # (N, C, 4)

    # drop background column; flatten (N, C-1)
    fg_scores = scores[:, 1:].reshape(-1)
    fg_boxes = boxes[:, 1:, :].reshape(-1, 4)
    fg_labels = jnp.tile(jnp.arange(1, num_classes), proposals.shape[0])
    fg_valid = jnp.repeat(prop_valid, num_classes - 1)

    w = fg_boxes[:, 2] - fg_boxes[:, 0]
    h = fg_boxes[:, 3] - fg_boxes[:, 1]
    fg_valid = fg_valid & (w >= 0.01) & (h >= 0.01) & (fg_scores > score_thresh)

    idx, keep = batched_nms(
        fg_boxes, fg_scores, fg_labels, nms_thresh, detections_per_img,
        valid=fg_valid,
    )
    return fg_boxes[idx], fg_labels[idx], fg_scores[idx], keep


# --------------------------------------------------------------------------- #
# Mask / keypoint targets + losses
# --------------------------------------------------------------------------- #


def _axis_interp_weights(starts: jnp.ndarray, bins: jnp.ndarray, n: int,
                         size: int, s: int = 2) -> jnp.ndarray:
    """Per-RoI 1-D RoIAlign interpolation matrix ``(K, size, n)``.

    RoIAlign's 2-D bilinear sampling factorizes exactly per axis: sample
    positions are outer products of per-axis positions, bilinear weights are
    ``wy·wx``, and every edge rule in ``ops/roi_align.py`` is per-axis —
    out-of-range zeroing (``pos <= -1`` or ``>= n``), the ``clip(pos, 0)``
    floor, and the top-edge collapse (a clipped position in ``(n-1, n)``
    puts weight 1 on the last cell, which ``relu(1-|clip(pos)-h|)`` with a
    two-sided clip reproduces). The s-sample mean folds into the matrix.
    """
    # sample positions per output cell: start + (i + (p+.5)/s) * bin
    grid = (jnp.arange(size)[:, None]
            + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)  # (size*s,)
    pos = starts[:, None] + grid[None, :] * bins[:, None]       # (K, size*s)
    oob = (pos <= -1.0) | (pos >= n)
    pos = jnp.clip(pos, 0.0, n - 1.0)
    cells = jnp.arange(n, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - cells))  # (K, size*s, n)
    w = jnp.where(oob[..., None], 0.0, w)
    return w.reshape(starts.shape[0], size, s, n).mean(axis=2)


def project_masks_on_boxes(gt_masks: jnp.ndarray, boxes: jnp.ndarray,
                           matched_idx: jnp.ndarray, size: int = 28) -> jnp.ndarray:
    """Crop each matched GT mask to its proposal box at ``size×size``
    (torchvision roi_aligns the full-res mask against its own box,
    sampling_ratio=2, aligned=False).

    TPU design: the generic gather-based ``roi_align`` made this the
    dominant cost of the mask train step (round-5 probe: 141.6 ms of a
    184.3 ms step at B=4 — gathers over (K, H, W) full-res masks). Bilinear
    sampling is LINEAR in the mask and factorizes per axis, so the exact
    same numbers come from two batched interpolation matmuls
    ``R_y @ M @ R_xᵀ`` (the ops/roi_align.py dense-einsum trick applied to
    training); the GT gather folds into a one-hot matmul as well.
    """
    K = boxes.shape[0]
    G, H, W = gt_masks.shape
    x1, y1, x2, y2 = (boxes[:, i].astype(jnp.float32) for i in range(4))
    # aligned=False: malformed rois forced to size >= 1 (ops/roi_align.py:92)
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    ry = _axis_interp_weights(y1, roi_h / size, H, size)  # (K, size, H)
    rx = _axis_interp_weights(x1, roi_w / size, W, size)  # (K, size, W)
    # one-hot matmul instead of a gather: (K, G) @ (G, H*W)
    sel = jax.nn.one_hot(matched_idx, G, dtype=jnp.float32)
    masks = (sel @ gt_masks.astype(jnp.float32).reshape(G, H * W)
             ).reshape(K, H, W)
    rows = jnp.einsum("kih,khw->kiw", ry, masks)
    return jnp.einsum("kiw,kjw->kij", rows, rx)


def maskrcnn_loss(mask_logits: jnp.ndarray, cls_targets: jnp.ndarray,
                  mask_targets: jnp.ndarray, fg: jnp.ndarray) -> jnp.ndarray:
    """BCE over the target-class mask channel of positive samples."""
    k = mask_logits.shape[0]
    per_class = jnp.take_along_axis(
        mask_logits, cls_targets[:, None, None, None].astype(jnp.int32), axis=-1
    )[..., 0]  # (K, S, S)
    bce = optax_sigmoid_ce(per_class, (mask_targets > 0.5).astype(jnp.float32))
    per_roi = bce.mean(axis=(1, 2))
    denom = jnp.maximum(fg.sum(), 1.0)
    return jnp.sum(per_roi * fg.astype(jnp.float32)) / denom


def keypoints_to_heatmap_targets(
    keypoints: jnp.ndarray, boxes: jnp.ndarray, heatmap_size: int = 56
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Map (x, y, vis) keypoints into per-box heatmap cell indices
    (torchvision ``keypoints_to_heatmap``). Returns (flat indices, validity)."""
    x1, y1 = boxes[:, 0:1], boxes[:, 1:2]
    w = jnp.maximum(boxes[:, 2:3] - boxes[:, 0:1], 1e-6)
    h = jnp.maximum(boxes[:, 3:4] - boxes[:, 1:2], 1e-6)
    scale_x = heatmap_size / w
    scale_y = heatmap_size / h
    x = (keypoints[..., 0] - x1) * scale_x
    y = (keypoints[..., 1] - y1) * scale_y
    x = jnp.floor(x).astype(jnp.int32)
    y = jnp.floor(y).astype(jnp.int32)
    # torchvision: points exactly on the far edge snap inside
    x = jnp.clip(x, 0, heatmap_size - 1)
    y = jnp.clip(y, 0, heatmap_size - 1)
    in_box = (
        (keypoints[..., 0] >= x1)
        & (keypoints[..., 0] < x1 + w)
        & (keypoints[..., 1] >= y1)
        & (keypoints[..., 1] < y1 + h)
    )
    vis = (keypoints[..., 2] > 0) & in_box
    return y * heatmap_size + x, vis


def keypointrcnn_loss(kp_logits: jnp.ndarray, kp_targets: jnp.ndarray,
                      kp_valid: jnp.ndarray, fg: jnp.ndarray) -> jnp.ndarray:
    """CE over spatial positions per visible keypoint of positive samples."""
    K, S, _, NK = kp_logits.shape
    flat = kp_logits.transpose(0, 3, 1, 2).reshape(K * NK, S * S)
    targets = kp_targets.reshape(K * NK)
    weights = (kp_valid & fg[:, None]).astype(jnp.float32).reshape(K * NK)
    return cross_entropy(flat, targets, weights=weights)


def _bicubic_up_matrix(S: int, So: int) -> np.ndarray:
    """(So, S) interpolation matrix matching torch ``F.interpolate`` bicubic:
    a = -0.75 convolution kernel, ``align_corners=False`` source grid
    ``src = (o + 0.5)·S/So − 0.5``, border-replicate taps (torch clamps tap
    indices; weights of clamped taps accumulate on the border row)."""
    a = -0.75

    def k(t):
        t = abs(float(t))
        if t <= 1.0:
            return (a + 2.0) * t ** 3 - (a + 3.0) * t ** 2 + 1.0
        if t < 2.0:
            return a * t ** 3 - 5.0 * a * t ** 2 + 8.0 * a * t - 4.0 * a
        return 0.0

    W = np.zeros((So, S), np.float32)
    for o in range(So):
        src = (o + 0.5) * S / So - 0.5
        t0 = int(np.floor(src))
        f = src - t0
        for m in range(4):
            j = t0 - 1 + m
            W[o, min(max(j, 0), S - 1)] += k(f + 1.0 - m)
    return W


def heatmaps_to_keypoints(kp_logits: jnp.ndarray, boxes: jnp.ndarray,
                          upsample: int = 4):
    """Decode heatmaps → image-space keypoints + scores.

    torchvision ``heatmaps_to_keypoints`` (≥0.12, the reference's pin)
    bicubic-upsamples each RoI's heatmap to the *box-sized* grid
    ``(ceil(h), ceil(w))`` before the argmax, then maps
    ``x = (x_int + 0.5)·w/ceil(w) + x1``. A per-RoI output size is a dynamic
    shape, so this static-shape version upsamples every map to the fixed
    ``(upsample·S)²`` grid with the same bicubic kernel (a = −0.75,
    ``align_corners=False``, border replicate) and applies the analogous
    correction ``x = (x_int + 0.5)·w/(u·S) + x1``. Both grids sample the same
    continuous bicubic surface: when ``ceil(w) == upsample·S`` (224-px boxes
    at S=56, u=4 — the production head-crop regime) the decode is
    torchvision-exact; otherwise the peak differs by at most ~one grid step
    of each grid (≲1 px for 50–300 px boxes; pinned by
    ``tests/test_eval_path_torch_parity.py::test_keypoint_decode_*``).
    The previous nearest-cell decode quantized landmarks to w/56 ≈ 4 px —
    a real drift vs the reference's alignment inputs.

    Cost control: materializing the full (u·S)² upsample costs ~1.7 ms/batch
    at serving sizes, so the decode is two-pass — nearest-cell argmax on the
    S² grid, then the true bicubic values of a 16-cell output window around
    it. The window is cell-aligned, so ONE fixed local matrix covers every
    RoI (the per-window values are bit-identical to the full grid's:
    replicate-padding the map by 2 cells reproduces torch's tap-index
    clamping exactly, and the bicubic weight pattern is then
    shift-invariant). Exact whenever the bicubic global max lies within
    ±4 cells of the discrete max — true for the unimodal peaks CE-trained
    keypoint heads produce (multi-peak near-ties are out of contract: the
    landmark is ambiguous there for torchvision's global argmax too);
    equivalence with torchvision's decode is pinned in the tests on
    realistic peaked maps."""
    K, S, _, NK = kp_logits.shape
    u = upsample
    Su = u * S
    cells = min(8, S)            # refine window: ±4 heatmap cells
    taps = cells + 4             # bicubic support of the window's outputs
    Wn = u * cells
    maps = kp_logits.astype(jnp.float32)        # (K, S, S, NK)

    # pass 1: nearest-cell peak on the coarse grid. Argmax rides the LAST
    # (lane) axis: reducing over a 3136-long sublane axis with NK=3 lanes
    # runs the VPU at 2% lane fill — the transposed copy is cheaper.
    idx_c = jnp.argmax(
        maps.transpose(0, 3, 1, 2).reshape(K, NK, S * S), axis=-1)  # (K, NK)
    cy = (idx_c // S).astype(jnp.int32)
    cx = (idx_c % S).astype(jnp.int32)

    # pass 2: fixed local bicubic matrix on a cell-aligned window.
    # U_local[i, j]: weight of padded-window row j for output u·wy0 + i —
    # src_local = (i + 0.5)/u − 0.5 + 2 is wy0-independent, and its taps
    # stay inside [0, taps) (replicate padding stands in for clamping).
    a = -0.75

    def _k(t):
        t = abs(float(t))
        if t <= 1.0:
            return (a + 2.0) * t ** 3 - (a + 3.0) * t ** 2 + 1.0
        if t < 2.0:
            return a * t ** 3 - 5.0 * a * t ** 2 + 8.0 * a * t - 4.0 * a
        return 0.0

    Ul = np.zeros((Wn, taps), np.float32)
    for i in range(Wn):
        src = (i + 0.5) / u - 0.5 + 2.0
        t0 = int(np.floor(src))
        f = src - t0
        for m in range(4):
            Ul[i, t0 - 1 + m] += _k(f + 1.0 - m)
    Ul = jnp.asarray(Ul)

    wy0 = jnp.clip(cy - cells // 2, 0, S - cells)
    wx0 = jnp.clip(cx - cells // 2, 0, S - cells)
    padded = jnp.pad(maps, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")
    padded = padded.transpose(0, 3, 1, 2).reshape(K * NK, S + 4, S + 4)
    # window extraction via one-hot MATMULS, not gathers: a vmap'd
    # dynamic_slice lowers to a per-RoI gather that costs ~0.5 ms/batch on
    # TPU; folding the window offset into the interpolation operands keeps
    # everything on the MXU. Uy_b[b] = Ul shifted to start at column wy0[b].
    cols = jnp.arange(S + 4, dtype=jnp.int32)
    Oy = (cols[None, None, :]
          == (wy0.reshape(-1)[:, None, None]
              + jnp.arange(taps, dtype=jnp.int32)[None, :, None])
          ).astype(jnp.float32)                    # (K·NK, taps, S+4)
    Ox = (cols[None, None, :]
          == (wx0.reshape(-1)[:, None, None]
              + jnp.arange(taps, dtype=jnp.int32)[None, :, None])
          ).astype(jnp.float32)
    Uy_b = jnp.einsum("oj,bjc->boc", Ul, Oy)       # (K·NK, Wn, S+4)
    Ux_b = jnp.einsum("pk,bkc->bpc", Ul, Ox)
    win = jnp.einsum("boc,bcd->bod", Uy_b, padded)  # (K·NK, Wn, S+4)
    win = jnp.einsum("bod,bpd->bop", win, Ux_b)     # (K·NK, Wn, Wn)
    flat = win.reshape(K, NK, Wn * Wn)
    idx = jnp.argmax(flat, axis=-1)
    scores = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    yy = ((idx // Wn) + u * wy0).astype(jnp.float32)
    xx = ((idx % Wn) + u * wx0).astype(jnp.float32)

    x1, y1 = boxes[:, 0:1], boxes[:, 1:2]
    w = jnp.maximum(boxes[:, 2:3] - boxes[:, 0:1], 1e-6)
    h = jnp.maximum(boxes[:, 3:4] - boxes[:, 1:2], 1e-6)
    x = (xx + 0.5) * w / Su + x1
    y = (yy + 0.5) * h / Su + y1
    vis = jnp.ones_like(scores)
    return jnp.stack([x, y, vis], axis=-1), scores
