"""Region Proposal Network — static-shape, torchvision-semantics.

Replaces the RPN inside torchvision's ``FasterRCNN/MaskRCNN/KeypointRCNN`` used by
the reference (``/root/reference/models/detection/rcnn.py:13-43``,
``configs/mask/mask_rcnn_config.py:60-79``). Matching rules, sampling ratios, and
loss normalization follow torchvision so converted checkpoints propose the same
boxes; every dynamic structure is replaced by fixed budgets + validity masks
(SURVEY.md §7 "Dynamic → static shapes").

Pipeline per image:
  head logits → per-level top-``pre_nms_top_n`` → decode+clip → drop tiny →
  per-level NMS (level-offset batched NMS) → global top-``post_nms_top_n``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..losses import optax_sigmoid_ce, smooth_l1
from ..ops.boxes import clip_boxes, decode_boxes, encode_boxes, pairwise_iou
from ..ops.nms import nms
from .quant import ActQuant, QuantConv


class RPNHead(nn.Module):
    """Shared 3×3 conv + 1×1 objectness / box-delta heads (torchvision RPNHead).

    ``quant`` (None | "calibrate" | "int8"): serving int8 PTQ for the shared
    3×3 conv — the p2-level 80² 256-ch conv is ~half the quality pipeline's
    FLOPs (PERF.md). The 1×1 predictor heads stay in the compute dtype: their
    contraction is tiny (MXU-starved either way) and the logits/deltas feed
    threshold comparisons directly. The shared conv's activation scale is
    PER-LEVEL (one ActQuant per pyramid level): p2 vs p6 magnitudes differ a
    lot, and a shared per-tensor scale would waste int8 resolution on the
    low-magnitude levels. Scales live in the ``quant`` collection, so the
    ``params`` tree (and the torchvision converters) are unaffected.
    """

    num_anchors: int
    dtype: Any = jnp.float32
    quant: Any = None

    @nn.compact
    def __call__(self, feats: dict[str, jnp.ndarray]):
        C = feats[next(iter(feats))].shape[-1]
        if self.quant is not None:
            cal = self.quant == "calibrate"
            qconv = QuantConv(C, (3, 3), padding=((1, 1), (1, 1)),
                              dtype=self.dtype, use_bias=True, calibrate=cal,
                              name="conv")

            def conv(x, lvl):
                aq = ActQuant(calibrate=cal, name=f"conv_q_{lvl}")
                return qconv(*aq(x))
        else:
            _conv = nn.Conv(C, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name="conv")
            conv = lambda x, lvl: _conv(x)  # noqa: E731
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      name="cls_logits")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      name="bbox_pred")
        logits, deltas = [], []
        for lvl in sorted(feats):
            t = nn.relu(conv(feats[lvl], lvl))
            B = t.shape[0]
            logits.append(cls(t).reshape(B, -1))
            deltas.append(reg(t).reshape(B, -1, 4))
        return jnp.concatenate(logits, 1), jnp.concatenate(deltas, 1)


def _level_ids(feature_sizes: Sequence[tuple[int, int]], num_anchors: int):
    ids = []
    for lvl, (h, w) in enumerate(feature_sizes):
        ids.append(jnp.full((h * w * num_anchors,), lvl, jnp.int32))
    return jnp.concatenate(ids)


def generate_proposals(
    objectness: jnp.ndarray,
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    level_ids: jnp.ndarray,
    image_size: tuple[int, int],
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thresh: float = 0.7,
    min_size: float = 1e-3,
    score_thresh: float = 0.0,
    num_levels: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched proposal generation, TPU-shaped.

    Never materializes anything anchor-count-quadratic: per level, gather the
    top-``pre_nms_top_n`` anchors first (``lax.top_k``), decode only those, then
    run fixed-size NMS vmapped over levels (FPN levels never suppress each other —
    same semantics as torchvision's level-offset batched NMS), and finally take the
    global top-``post_nms_top_n`` across levels by score.

    Args:
      objectness: ``(B, N)`` raw logits; deltas ``(B, N, 4)``; anchors ``(N, 4)``;
      level_ids: host ``(N,)`` int array (compile-time constant).
    Returns:
      ``(B, post_nms_top_n, 4)`` proposals and ``(B, post_nms_top_n)`` validity.
    """
    import numpy as _np

    level_ids_np = _np.asarray(level_ids)
    if num_levels is None:
        num_levels = int(level_ids_np.max()) + 1
    level_slices = [
        _np.nonzero(level_ids_np == lvl)[0] for lvl in range(num_levels)
    ]
    k = min(pre_nms_top_n, max(len(s) for s in level_slices))
    anchors = jnp.asarray(anchors)
    B = objectness.shape[0]
    L = num_levels

    # Batched per-level gather: top-k + decode only the survivors.
    lvl_boxes, lvl_scores, lvl_valid = [], [], []
    for sl in level_slices:
        s = objectness[:, sl[0] : sl[0] + len(sl)]       # (B, n_l)
        d = deltas[:, sl[0] : sl[0] + len(sl)]
        a = anchors[sl[0] : sl[0] + len(sl)]
        kk = min(k, len(sl))
        top_s, top_i = jax.lax.top_k(s, kk)              # (B, kk) sorted desc
        boxes = decode_boxes(jnp.take_along_axis(d, top_i[..., None], 1),
                             a[top_i])
        boxes = clip_boxes(boxes, image_size)
        w = boxes[..., 2] - boxes[..., 0]
        h = boxes[..., 3] - boxes[..., 1]
        # torchvision filters on sigmoid PROBABILITIES (>= score_thresh, default
        # 0.0 — a no-op since probs are strictly positive); comparing raw logits
        # would silently drop sub-0.5-prob proposals torchvision keeps
        valid = ((w >= min_size) & (h >= min_size)
                 & (jax.nn.sigmoid(top_s) >= score_thresh)
                 & jnp.isfinite(top_s))
        pad = k - kk
        if pad:
            boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
            top_s = jnp.pad(top_s, ((0, 0), (0, pad)),
                            constant_values=-jnp.inf)
            valid = jnp.pad(valid, ((0, 0), (0, pad)))
        lvl_boxes.append(boxes)
        lvl_scores.append(top_s)
        lvl_valid.append(valid)

    boxes = jnp.stack(lvl_boxes, 1).reshape(B * L, k, 4)
    scores_k = jnp.stack(lvl_scores, 1).reshape(B * L, k)
    valid = jnp.stack(lvl_valid, 1).reshape(B * L, k)

    use_pallas = jax.default_backend() != "cpu"
    if use_pallas:
        # one Pallas program per (image, level): VMEM-resident exact greedy NMS
        from ..ops.pallas_nms import nms_keep_sorted_batch

        keep = nms_keep_sorted_batch(boxes, valid, nms_thresh) > 0.0
        kept_scores = jnp.where(keep, jax.nn.sigmoid(scores_k), -jnp.inf)
        kept_boxes = boxes
    else:
        def level_nms(b, s, v):
            idx, kp = nms(b, jax.nn.sigmoid(s), nms_thresh, k, valid=v)
            return b[idx], jnp.where(kp, jax.nn.sigmoid(s)[idx], -jnp.inf), kp

        kept_boxes, kept_scores, keep = jax.vmap(level_nms)(
            boxes, scores_k, valid
        )

    flat_boxes = kept_boxes.reshape(B, L * k, 4)
    flat_scores = kept_scores.reshape(B, L * k)
    flat_keep = keep.reshape(B, L * k)
    top_s, top_i = jax.lax.top_k(flat_scores, post_nms_top_n)
    out_boxes = jnp.take_along_axis(flat_boxes, top_i[..., None], 1)
    out_keep = jnp.take_along_axis(flat_keep, top_i, 1) & (top_s > -jnp.inf)
    return out_boxes, out_keep


def assign_rpn_targets(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    fg_iou_thresh: float = 0.7,
    bg_iou_thresh: float = 0.3,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image anchor labels (1 fg / 0 bg / -1 ignore) and matched GT boxes.

    torchvision Matcher semantics with ``allow_low_quality_matches``: anchors whose
    IoU with *some* gt equals that gt's best IoU are forced positive.
    """
    iou = pairwise_iou(anchors, gt_boxes)  # (N, M)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_iou = iou.max(axis=1)
    best_gt = iou.argmax(axis=1)

    labels = jnp.full(anchors.shape[0], -1, jnp.int32)
    labels = jnp.where(best_iou < bg_iou_thresh, 0, labels)
    labels = jnp.where(best_iou >= fg_iou_thresh, 1, labels)

    # low-quality matches: for each valid gt, its argmax anchors become fg
    per_gt_best = jnp.where(gt_valid, iou.max(axis=0), -2.0)  # (M,)
    is_best_for_some_gt = jnp.any(
        (iou == per_gt_best[None, :]) & gt_valid[None, :] & (iou > 0), axis=1
    )
    labels = jnp.where(is_best_for_some_gt, 1, labels)

    matched = gt_boxes[best_gt]
    return labels, matched


def sample_balanced(
    labels: jnp.ndarray,
    rng: jax.Array,
    batch_size: int = 256,
    positive_fraction: float = 0.5,
) -> jnp.ndarray:
    """Random balanced fg/bg sampling with static budgets.

    Returns a float mask over anchors: 1.0 for sampled entries. Counts match
    torchvision's ``BalancedPositiveNegativeSampler``: up to
    ``batch_size * positive_fraction`` positives, remainder negatives.
    """
    n = labels.shape[0]
    n_pos_budget = int(batch_size * positive_fraction)
    noise = jax.random.uniform(rng, (n,))

    is_pos = labels == 1
    is_neg = labels == 0
    n_pos = jnp.minimum(is_pos.sum(), n_pos_budget)
    n_neg = jnp.minimum(is_neg.sum(), batch_size - n_pos)

    pos_rank = jnp.argsort(
        jnp.argsort(jnp.where(is_pos, noise, 2.0))
    )  # rank among positives (ties broken by noise); non-pos pushed to the end
    neg_rank = jnp.argsort(jnp.argsort(jnp.where(is_neg, noise, 2.0)))
    sampled = (is_pos & (pos_rank < n_pos)) | (is_neg & (neg_rank < n_neg))
    return sampled.astype(jnp.float32)


def rpn_loss(
    objectness: jnp.ndarray,
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    rng: jax.Array,
    batch_size_per_image: int = 256,
    positive_fraction: float = 0.5,
) -> dict[str, jnp.ndarray]:
    """Batched RPN loss (torchvision normalization: both terms / total sampled)."""

    def per_image(scores, dts, gtb, gtv, key):
        labels, matched = assign_rpn_targets(anchors, gtb, gtv)
        sampled = sample_balanced(labels, key, batch_size_per_image,
                                  positive_fraction)
        n_sampled = jnp.maximum(sampled.sum(), 1.0)

        cls = optax_sigmoid_ce(scores, (labels == 1).astype(jnp.float32))
        cls_loss = jnp.sum(cls * sampled) / n_sampled

        pos = sampled * (labels == 1)
        targets = encode_boxes(matched, anchors)
        reg = smooth_l1(dts, targets).sum(-1)
        reg_loss = jnp.sum(reg * pos) / n_sampled
        return cls_loss, reg_loss

    keys = jax.random.split(rng, objectness.shape[0])
    cls_losses, reg_losses = jax.vmap(per_image)(
        objectness, deltas, gt_boxes, gt_valid, keys
    )
    return {
        "loss_objectness": cls_losses.mean(),
        "loss_rpn_box_reg": reg_losses.mean(),
    }
