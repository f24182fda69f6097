"""Full-graph eval-path parity vs a torch replica of torchvision postprocess.

The reference's detection quality comes from torchvision's eval-time pipeline
(``/root/reference/models/detection/rcnn.py:13-43`` configures stock torchvision
R-CNNs; the semantics live in torchvision 0.11's ``rpn.filter_proposals``,
``roi_heads.postprocess_detections``, ``box_ops`` and ``LevelMapper``).
torchvision itself is absent from this image, so this file hand-builds those
semantics in torch (CPU) as an executable specification, and asserts box-for-box
equality with our static-shape TPU formulation:

- box decode: dw/dh clamp at log(1000/16), ±0.5·size corners;
- RPN: per-level top-k -> decode -> clip -> small-box & score filters ->
  level-offset batched NMS -> global top post_nms_top_n by score;
- box head: softmax scores, per-class decode (10,10,5,5), background drop,
  score/small filters, class-offset batched NMS, detections_per_img truncation;
- FPN level mapping: floor(4 + log2(sqrt(area)/224) + eps) clamped to
  [k_min, k_max] (the k0=4 canonical rule).

Every replica function cites the torchvision method it reimplements. Ties are
excluded by construction (continuous random scores): torchvision's sort is not
stable, so tie order is undefined in the reference itself.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from pets_face_recognition_tpu.models import roi_heads as rh
from pets_face_recognition_tpu.models.rpn import generate_proposals
from pets_face_recognition_tpu.ops.anchors import multilevel_anchors

_XFORM_CLIP = math.log(1000.0 / 16.0)


# --------------------------------------------------------------------------- #
# torch replica of torchvision 0.11 semantics
# --------------------------------------------------------------------------- #


def tv_decode(deltas: torch.Tensor, boxes: torch.Tensor, weights) -> torch.Tensor:
    """torchvision ``BoxCoder.decode_single``."""
    wx, wy, ww, wh = weights
    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights
    dx = deltas[:, 0::4] / wx
    dy = deltas[:, 1::4] / wy
    dw = torch.clamp(deltas[:, 2::4] / ww, max=_XFORM_CLIP)
    dh = torch.clamp(deltas[:, 3::4] / wh, max=_XFORM_CLIP)
    pred_ctr_x = dx * widths[:, None] + ctr_x[:, None]
    pred_ctr_y = dy * heights[:, None] + ctr_y[:, None]
    pred_w = torch.exp(dw) * widths[:, None]
    pred_h = torch.exp(dh) * heights[:, None]
    out = torch.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w,
            pred_ctr_y + 0.5 * pred_h,
        ],
        dim=2,
    )
    return out  # (N, C, 4)


def tv_clip(boxes: torch.Tensor, image_size) -> torch.Tensor:
    """torchvision ``box_ops.clip_boxes_to_image``."""
    h, w = image_size
    x = boxes[..., 0::2].clamp(min=0, max=w)
    y = boxes[..., 1::2].clamp(min=0, max=h)
    out = torch.empty_like(boxes)
    out[..., 0::2] = x
    out[..., 1::2] = y
    return out


def tv_remove_small(boxes: torch.Tensor, min_size: float) -> torch.Tensor:
    """torchvision ``box_ops.remove_small_boxes`` keep mask."""
    ws = boxes[:, 2] - boxes[:, 0]
    hs = boxes[:, 3] - boxes[:, 1]
    return (ws >= min_size) & (hs >= min_size)


def tv_nms(boxes: torch.Tensor, scores: torch.Tensor, thr: float) -> torch.Tensor:
    """Greedy NMS, suppression at ``iou > thr`` (torchvision C++ ``nms``).

    Returns kept indices in descending-score order.
    """
    order = torch.argsort(scores, descending=True)
    keep = []
    suppressed = torch.zeros(len(scores), dtype=torch.bool)
    areas = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * (
        boxes[:, 3] - boxes[:, 1]
    ).clamp(min=0)
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        lt = torch.maximum(boxes[i, :2], boxes[:, :2])
        rb = torch.minimum(boxes[i, 2:], boxes[:, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[:, 0] * wh[:, 1]
        union = areas[i] + areas - inter
        iou = torch.where(union > 0, inter / union, torch.zeros_like(union))
        suppressed |= iou > thr
    return torch.as_tensor(keep, dtype=torch.long)


def tv_batched_nms(boxes, scores, idxs, thr):
    """torchvision ``box_ops.batched_nms`` (coordinate-offset trick)."""
    if boxes.numel() == 0:
        return torch.zeros(0, dtype=torch.long)
    max_coord = boxes.max()
    offsets = idxs.to(boxes.dtype) * (max_coord + 1)
    return tv_nms(boxes + offsets[:, None], scores, thr)


def tv_filter_proposals(
    proposals: torch.Tensor,   # (N, 4) decoded, unclipped
    objectness: torch.Tensor,  # (N,) raw logits
    level_of: torch.Tensor,    # (N,) int level ids
    image_size,
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thr: float,
    min_size: float = 1e-3,
    score_thresh: float = 0.0,
):
    """torchvision ``RegionProposalNetwork.filter_proposals`` for one image."""
    probs = torch.sigmoid(objectness)
    keep_parts = []
    for lvl in level_of.unique(sorted=True).tolist():
        idx = torch.nonzero(level_of == lvl).flatten()
        k = min(pre_nms_top_n, len(idx))
        top = torch.topk(probs[idx], k).indices
        keep_parts.append(idx[top])
    sel = torch.cat(keep_parts)
    boxes = tv_clip(proposals[sel], image_size)
    scores = probs[sel]
    lvls = level_of[sel]
    keep = tv_remove_small(boxes, min_size)
    boxes, scores, lvls = boxes[keep], scores[keep], lvls[keep]
    keep = scores >= score_thresh
    boxes, scores, lvls = boxes[keep], scores[keep], lvls[keep]
    keep = tv_batched_nms(boxes, scores, lvls, nms_thr)[:post_nms_top_n]
    return boxes[keep], scores[keep]


def tv_postprocess_detections(
    class_logits: torch.Tensor,  # (N, C)
    box_deltas: torch.Tensor,    # (N, C*4)
    proposals: torch.Tensor,     # (N, 4)
    image_size,
    score_thresh: float,
    nms_thr: float,
    detections_per_img: int,
):
    """torchvision ``RoIHeads.postprocess_detections`` for one image."""
    num_classes = class_logits.shape[1]
    boxes = tv_decode(box_deltas, proposals, (10.0, 10.0, 5.0, 5.0))
    scores = torch.softmax(class_logits, dim=-1)
    boxes = tv_clip(boxes, image_size)
    labels = torch.arange(num_classes).expand_as(scores)
    # drop background, flatten
    boxes = boxes[:, 1:].reshape(-1, 4)
    scores = scores[:, 1:].reshape(-1)
    labels = labels[:, 1:].reshape(-1)
    inds = torch.nonzero(scores > score_thresh).flatten()
    boxes, scores, labels = boxes[inds], scores[inds], labels[inds]
    keep = tv_remove_small(boxes, min_size=1e-2)
    boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
    keep = tv_batched_nms(boxes, scores, labels, nms_thr)[:detections_per_img]
    return boxes[keep], labels[keep], scores[keep]


def tv_level_map(boxes: torch.Tensor, k_min: int, k_max: int) -> torch.Tensor:
    """torchvision ``LevelMapper.__call__`` (canonical_scale=224, level=4,
    eps added OUTSIDE the log2)."""
    s = torch.sqrt(
        (boxes[:, 2] - boxes[:, 0]).clamp(min=0)
        * (boxes[:, 3] - boxes[:, 1]).clamp(min=0)
    )
    lvl = torch.floor(4 + torch.log2(s / 224.0) + 1e-6)
    return torch.clamp(lvl, min=k_min, max=k_max).to(torch.int64)


# --------------------------------------------------------------------------- #
# fixtures
# --------------------------------------------------------------------------- #

IMAGE_SIZE = (64, 64)
FEATURE_SIZES = [(8, 8), (4, 4), (2, 2)]
STRIDES = [8, 16, 32]
ANCHOR_SIZES = ((16, 32), (24, 48), (48, 96))
ASPECTS = (0.5, 1.0, 2.0)
A = len(ANCHOR_SIZES[0]) * len(ASPECTS)


def _rpn_inputs(seed, bias=0.0):
    anchors = np.asarray(
        multilevel_anchors(FEATURE_SIZES, STRIDES, ANCHOR_SIZES, ASPECTS),
        np.float32,
    )
    level_ids = np.concatenate(
        [np.full(h * w * A, i, np.int32) for i, (h, w) in enumerate(FEATURE_SIZES)]
    )
    r = np.random.RandomState(seed)
    N = anchors.shape[0]
    objectness = (r.randn(2, N) + bias).astype(np.float32)
    deltas = (r.randn(2, N, 4) * 0.4).astype(np.float32)
    # a few extreme deltas to exercise the log(1000/16) clamp and tiny boxes
    deltas[:, ::17, 2:] = 8.0
    deltas[:, ::23, 2:] = -9.0
    return anchors, level_ids, objectness, deltas


# --------------------------------------------------------------------------- #
# tests
# --------------------------------------------------------------------------- #


def test_box_decode_clamp_parity(rng):
    from pets_face_recognition_tpu.ops.boxes import decode_boxes

    boxes = np.abs(rng.randn(32, 4)).astype(np.float32) * 20
    boxes[:, 2:] = boxes[:, :2] + 5 + np.abs(rng.randn(32, 2)).astype(np.float32) * 30
    deltas = (rng.randn(32, 8) * 3).astype(np.float32)  # 2 classes, huge deltas
    ref = tv_decode(
        torch.from_numpy(deltas), torch.from_numpy(boxes), (10.0, 10.0, 5.0, 5.0)
    ).numpy()
    ours = np.asarray(
        decode_boxes(
            jnp.asarray(deltas.reshape(32, 2, 4)),
            jnp.asarray(boxes)[:, None, :],
            (10.0, 10.0, 5.0, 5.0),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("bias", [0.0, -2.0], ids=["mixed", "mostly_negative"])
def test_rpn_filter_proposals_parity(bias):
    """Per-level top-k -> NMS -> global top-n must match torchvision box-for-box.

    bias=-2 makes most objectness logits negative: torchvision still keeps
    them (its score_thresh=0.0 compares sigmoid probabilities, which are
    always > 0), so any logit-domain filtering shows up here.
    """
    anchors, level_ids, objectness, deltas = _rpn_inputs(7, bias)
    pre, post, thr = 40, 25, 0.7

    ours_b, ours_v = generate_proposals(
        jnp.asarray(objectness), jnp.asarray(deltas), jnp.asarray(anchors),
        level_ids, IMAGE_SIZE, pre, post, thr, num_levels=3,
    )
    ours_b, ours_v = np.asarray(ours_b), np.asarray(ours_v)

    from pets_face_recognition_tpu.ops.boxes import decode_boxes

    for img in range(2):
        dec = np.asarray(
            decode_boxes(jnp.asarray(deltas[img]), jnp.asarray(anchors))
        )
        ref_b, ref_s = tv_filter_proposals(
            torch.from_numpy(dec), torch.from_numpy(objectness[img]),
            torch.from_numpy(level_ids.astype(np.int64)), IMAGE_SIZE,
            pre, post, thr,
        )
        n = ours_v[img].sum()
        assert n == ref_b.shape[0], f"img {img}: {n} vs {ref_b.shape[0]}"
        np.testing.assert_allclose(
            ours_b[img][:n], ref_b.numpy(), rtol=0, atol=2e-2,
            err_msg=f"img {img} proposal boxes",
        )


def test_box_postprocess_parity(rng):
    N, C = 24, 4
    proposals = np.zeros((N, 4), np.float32)
    proposals[:, :2] = rng.uniform(0, 40, (N, 2))
    proposals[:, 2:] = proposals[:, :2] + rng.uniform(4, 24, (N, 2))
    logits = (rng.randn(N, C) * 2).astype(np.float32)
    bdeltas = (rng.randn(N, C, 4) * 0.3).astype(np.float32)
    bdeltas[::9, :, 2:] = -10.0  # degenerate boxes -> small-box filter
    score_thr, nms_thr, det = 0.05, 0.5, 6

    ref_b, ref_l, ref_s = tv_postprocess_detections(
        torch.from_numpy(logits), torch.from_numpy(bdeltas.reshape(N, C * 4)),
        torch.from_numpy(proposals), IMAGE_SIZE, score_thr, nms_thr, det,
    )

    ours_b, ours_l, ours_s, ours_v = rh.postprocess_detections(
        jnp.asarray(logits), jnp.asarray(bdeltas), jnp.asarray(proposals),
        jnp.ones(N, bool), IMAGE_SIZE, score_thr, nms_thr, det,
    )
    n = int(np.asarray(ours_v).sum())
    assert n == ref_b.shape[0]
    np.testing.assert_allclose(np.asarray(ours_s)[:n], ref_s.numpy(), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(ours_l)[:n], ref_l.numpy())
    np.testing.assert_allclose(np.asarray(ours_b)[:n], ref_b.numpy(), atol=1e-3)


def test_box_postprocess_batch_matches_per_image(rng):
    """The batched (Pallas-path) postprocess must equal the vmapped per-image
    one in interpret-free CPU mode (same math, different NMS kernel)."""
    B, N, C = 3, 16, 3
    proposals = np.zeros((B, N, 4), np.float32)
    proposals[..., :2] = rng.uniform(0, 40, (B, N, 2))
    proposals[..., 2:] = proposals[..., :2] + rng.uniform(4, 24, (B, N, 2))
    logits = (rng.randn(B, N, C) * 2).astype(np.float32)
    bdeltas = (rng.randn(B, N, C, 4) * 0.3).astype(np.float32)
    valid = np.ones((B, N), bool)
    valid[:, -3:] = False

    for b in range(B):
        bb, ll, ss, vv = rh.postprocess_detections(
            jnp.asarray(logits[b]), jnp.asarray(bdeltas[b]),
            jnp.asarray(proposals[b]), jnp.asarray(valid[b]),
            IMAGE_SIZE, 0.05, 0.5, 5,
        )
        # replica has no validity mask: emulate by forcing padded rows to
        # confident background so they can never surface
        masked = logits[b].copy()
        masked[~valid[b]] = np.array([50.0] + [-50.0] * (C - 1), np.float32)
        ref_b, ref_l, ref_s = tv_postprocess_detections(
            torch.from_numpy(masked),
            torch.from_numpy(bdeltas[b].reshape(N, C * 4)),
            torch.from_numpy(proposals[b]), IMAGE_SIZE, 0.05, 0.5, 5,
        )
        n = int(np.asarray(vv).sum())
        assert n == ref_b.shape[0]
        np.testing.assert_allclose(np.asarray(ss)[:n], ref_s.numpy(), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(ll)[:n], ref_l.numpy())


def test_fpn_level_mapping_parity(rng):
    from pets_face_recognition_tpu.ops.roi_align import roi_levels

    boxes = np.zeros((64, 4), np.float32)
    boxes[:, :2] = rng.uniform(0, 100, (64, 2))
    sides = np.concatenate(
        [rng.uniform(1, 500, (60,)), [0.0, 112.0, 224.0, 448.0]]
    ).astype(np.float32)
    boxes[:, 2] = boxes[:, 0] + sides
    boxes[:, 3] = boxes[:, 1] + sides * rng.uniform(0.5, 2.0, 64).astype(np.float32)

    ref = tv_level_map(torch.from_numpy(boxes), 2, 5).numpy()
    ours = np.asarray(roi_levels(jnp.asarray(boxes), 2, 5)) + 2
    np.testing.assert_array_equal(ours, ref)


def test_composed_eval_chain_parity():
    """RPN outputs -> proposals -> synthetic box tower -> final detections,
    the full postprocess chain composed, vs the replica composed the same way.

    The box tower is a fixed deterministic function of the proposal geometry
    (not a neural net) so both sides see bit-identical inputs without any
    torch<->flax weight conversion; NN-layer numerics are covered separately
    by tests/test_torch_parity.py.
    """
    anchors, level_ids, objectness, deltas = _rpn_inputs(11)
    pre, post, thr = 40, 16, 0.7
    C = 3

    ours_p, ours_pv = generate_proposals(
        jnp.asarray(objectness), jnp.asarray(deltas), jnp.asarray(anchors),
        level_ids, IMAGE_SIZE, pre, post, thr, num_levels=3,
    )
    ours_p, ours_pv = np.asarray(ours_p), np.asarray(ours_pv)

    def tower(props):  # deterministic pseudo-head, f32
        base = props @ np.asarray(
            [[0.11, -0.07, 0.05], [0.02, 0.13, -0.04],
             [-0.06, 0.01, 0.09], [0.04, -0.03, -0.08]], np.float32)
        logits = np.sin(base * 0.1).astype(np.float32) * 3
        bd = np.stack(
            [np.cos(props * 0.05), np.sin(props * 0.03) * 0.5,
             np.cos(props * 0.02) * 0.3], 1).astype(np.float32)
        return logits, bd

    from pets_face_recognition_tpu.ops.boxes import decode_boxes

    for img in range(2):
        dec = np.asarray(
            decode_boxes(jnp.asarray(deltas[img]), jnp.asarray(anchors)))
        ref_p, _ = tv_filter_proposals(
            torch.from_numpy(dec), torch.from_numpy(objectness[img]),
            torch.from_numpy(level_ids.astype(np.int64)), IMAGE_SIZE,
            pre, post, thr,
        )
        n = int(ours_pv[img].sum())
        assert n == ref_p.shape[0]
        # proposals must match box-for-box so the tower sees identical inputs
        np.testing.assert_allclose(ours_p[img][:n], ref_p.numpy(), atol=2e-2)

        logits, bd = tower(ours_p[img])
        # padded rows: force to confident background so they never surface
        logits[~ours_pv[img]] = np.array([50.0] + [-50.0] * (C - 1), np.float32)
        ob, ol, os_, ov = rh.postprocess_detections(
            jnp.asarray(logits), jnp.asarray(bd), jnp.asarray(ours_p[img]),
            jnp.asarray(ours_pv[img]), IMAGE_SIZE, 0.05, 0.5, 4,
        )
        ref_logits, ref_bd = tower(ref_p.numpy())
        rb, rl, rs = tv_postprocess_detections(
            torch.from_numpy(ref_logits),
            torch.from_numpy(ref_bd.reshape(-1, C * 4)),
            ref_p, IMAGE_SIZE, 0.05, 0.5, 4,
        )
        m = int(np.asarray(ov).sum())
        assert m == rb.shape[0], f"img {img}: {m} vs {rb.shape[0]}"
        np.testing.assert_allclose(np.asarray(os_)[:m], rs.numpy(), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(ol)[:m], rl.numpy())
        np.testing.assert_allclose(np.asarray(ob)[:m], rb.numpy(), atol=1e-3)


# --------------------------------------------------------------------------- #
# Keypoint heatmap decode vs torchvision >= 0.12 semantics
# --------------------------------------------------------------------------- #


def _tv_heatmaps_to_keypoints(maps: torch.Tensor, rois: torch.Tensor):
    """Replica of torchvision>=0.12 ``heatmaps_to_keypoints`` (the reference's
    pin): per-RoI bicubic upsample to the box-sized ``(ceil(h), ceil(w))``
    grid (``F.interpolate`` a=-0.75, align_corners=False), argmax, then
    ``(x_int + 0.5) * w / ceil(w) + x1``; scores = map value at the argmax."""
    offset_x = rois[:, 0]
    offset_y = rois[:, 1]
    widths = (rois[:, 2] - rois[:, 0]).clamp(min=1)
    heights = (rois[:, 3] - rois[:, 1]).clamp(min=1)
    widths_ceil = widths.ceil()
    heights_ceil = heights.ceil()
    num_keypoints = maps.shape[1]
    xy_preds = torch.zeros((len(rois), 3, num_keypoints), dtype=torch.float32)
    end_scores = torch.zeros((len(rois), num_keypoints), dtype=torch.float32)
    for i in range(len(rois)):
        roi_map_width = int(widths_ceil[i].item())
        roi_map_height = int(heights_ceil[i].item())
        width_correction = widths[i] / roi_map_width
        height_correction = heights[i] / roi_map_height
        roi_map = torch.nn.functional.interpolate(
            maps[i][:, None], size=(roi_map_height, roi_map_width),
            mode="bicubic", align_corners=False)[:, 0]
        w = roi_map.shape[2]
        pos = roi_map.reshape(num_keypoints, -1).argmax(dim=1)
        x_int = pos % w
        y_int = torch.div(pos - x_int, w, rounding_mode="floor")
        x = (x_int.float() + 0.5) * width_correction
        y = (y_int.float() + 0.5) * height_correction
        xy_preds[i, 0, :] = x + offset_x[i]
        xy_preds[i, 1, :] = y + offset_y[i]
        xy_preds[i, 2, :] = 1
        end_scores[i, :] = roi_map[
            torch.arange(num_keypoints), y_int.long(), x_int.long()]
    return xy_preds.permute(0, 2, 1), end_scores


def _smooth_heatmaps(rng, K, S=56, NK=3):
    """Realistic keypoint heatmaps: one dominant gaussian peak per map plus
    mild noise — the unimodal regime CE-trained keypoint heads produce (the
    windowed decode's contract; flat multi-peak near-tie maps are ambiguous
    for torchvision's global argmax too)."""
    yy, xx = np.mgrid[:S, :S].astype(np.float32)
    maps = np.empty((K, NK, S, S), np.float32)
    for k in range(K):
        for n in range(NK):
            cy, cx = rng.uniform(4, S - 4, 2)
            sig = rng.uniform(1.5, 4.0)
            peak = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig ** 2))
            maps[k, n] = 8.0 * peak + 0.3 * rng.randn(S, S)
    return torch.from_numpy(maps)


def test_keypoint_decode_exact_at_224_boxes(rng):
    """When ceil(box) == upsample*S (224-px boxes at S=56, u=4) the static
    grid IS torchvision's grid: decode must match exactly."""
    K = 6
    maps = _smooth_heatmaps(rng, K)
    boxes = []
    for _ in range(K):
        # dyadic offsets keep w = (x1 + 224) - x1 EXACTLY 224 in float32;
        # otherwise w rounds to 224.000015, torchvision ceils to a 225-wide
        # grid, and the comparison is no longer grid-identical
        x1, y1 = np.round(rng.uniform(0, 90, 2) * 8) / 8
        boxes.append([x1, y1, x1 + 224.0, y1 + 224.0])
    boxes_t = torch.tensor(boxes, dtype=torch.float32)

    want_xy, want_s = _tv_heatmaps_to_keypoints(maps, boxes_t)
    got_xy, got_s = rh.heatmaps_to_keypoints(
        jnp.asarray(maps.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(np.asarray(boxes, np.float32)))
    np.testing.assert_allclose(np.asarray(got_xy), want_xy.numpy(),
                               atol=1e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(got_s), want_s.numpy(),
                               atol=1e-3, rtol=1e-4)


def test_keypoint_decode_close_on_arbitrary_boxes(rng):
    """Arbitrary box sizes sample the same continuous bicubic surface on a
    different grid: peaks must agree within ~one grid step of each grid."""
    K = 16
    maps = _smooth_heatmaps(rng, K)
    boxes = []
    for _ in range(K):
        w, h = rng.uniform(50, 300, 2)
        x1, y1 = rng.uniform(0, 20, 2)
        boxes.append([x1, y1, x1 + w, y1 + h])
    boxes_t = torch.tensor(boxes, dtype=torch.float32)

    want_xy, _ = _tv_heatmaps_to_keypoints(maps, boxes_t)
    got_xy, _ = rh.heatmaps_to_keypoints(
        jnp.asarray(maps.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(np.asarray(boxes, np.float32)))
    err = np.abs(np.asarray(got_xy)[..., :2] - want_xy.numpy()[..., :2])
    # grid-step bound: torchvision step = w/ceil(w) ~ 1px, ours = w/224
    wh = np.asarray(boxes, np.float32)[:, None, 2:] \
        - np.asarray(boxes, np.float32)[:, None, :2]
    bound = 0.75 * (1.0 + wh / 224.0)
    assert (err <= bound).mean() > 0.95, (err.max(), err.mean())
    assert err.mean() < 1.0, err.mean()


def test_keypoint_decode_window_matches_full_grid(rng):
    """The cell-aligned windowed refine returns the same coords/scores as a
    full (u·S)² upsample whenever the bicubic global max is within the
    window — the decode's stated contract (and the replicate-pad trick's
    bit-exactness)."""
    from pets_face_recognition_tpu.models.roi_heads import _bicubic_up_matrix

    K, S, NK, u = 5, 56, 3, 4
    maps = _smooth_heatmaps(rng, K, S=S, NK=NK).numpy()
    boxes = np.asarray([[3.0, 5.0, 3.0 + 224.0, 5.0 + 224.0]] * K, np.float32)

    got_xy, got_s = rh.heatmaps_to_keypoints(
        jnp.asarray(maps.transpose(0, 2, 3, 1)), jnp.asarray(boxes))

    U = _bicubic_up_matrix(S, u * S)
    for k in range(K):
        for n in range(NK):
            up = U @ maps[k, n] @ U.T
            yi, xi = np.unravel_index(up.argmax(), up.shape)
            want_x = (xi + 0.5) * 224.0 / (u * S) + boxes[k, 0]
            want_y = (yi + 0.5) * 224.0 / (u * S) + boxes[k, 1]
            np.testing.assert_allclose(
                np.asarray(got_xy)[k, n, :2], [want_x, want_y], atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(got_s)[k, n], up[yi, xi], atol=1e-4, rtol=1e-5)
