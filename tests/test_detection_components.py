"""Unit tests for RPN/RoI-head building blocks and detection metrics."""

import numpy as np
import jax
import jax.numpy as jnp

from pets_face_recognition_tpu.engine.detection_metrics import (
    detection_metrics,
    greedy_ap,
    intersection_over_union,
    keypoint_errors,
)
from pets_face_recognition_tpu.models.rpn import (
    assign_rpn_targets,
    sample_balanced,
)
from pets_face_recognition_tpu.models.roi_heads import (
    heatmaps_to_keypoints,
    keypoints_to_heatmap_targets,
    postprocess_detections,
    select_training_samples,
)
from pets_face_recognition_tpu.ops.masks import paste_masks


def test_assign_rpn_targets_thresholds():
    anchors = jnp.asarray(
        [[0, 0, 10, 10], [0, 0, 9, 10], [50, 50, 60, 60], [0, 0, 30, 30]],
        jnp.float32,
    )
    gt = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    labels, matched = assign_rpn_targets(anchors, gt, jnp.asarray([True]))
    labels = np.asarray(labels)
    assert labels[0] == 1  # IoU 1.0 -> fg
    assert labels[1] == 1  # IoU 0.9 -> fg
    assert labels[2] == 0  # IoU 0 -> bg
    # anchor 3: IoU 100/900 ≈ 0.11 -> bg (and not best-for-gt)
    assert labels[3] == 0
    np.testing.assert_allclose(np.asarray(matched)[0], [0, 0, 10, 10])


def test_assign_rpn_targets_low_quality_match():
    # no anchor reaches 0.7, but the best one for the gt must still be positive
    anchors = jnp.asarray([[0, 0, 6, 10], [20, 20, 30, 30]], jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    labels, _ = assign_rpn_targets(anchors, gt, jnp.asarray([True]))
    assert int(labels[0]) == 1


def test_sample_balanced_budgets(rng):
    labels = jnp.asarray([1] * 10 + [0] * 300 + [-1] * 50)
    mask = sample_balanced(labels, jax.random.PRNGKey(0), batch_size=64,
                           positive_fraction=0.5)
    mask = np.asarray(mask)
    lab = np.asarray(labels)
    assert mask[lab == -1].sum() == 0
    assert mask[lab == 1].sum() == 10  # all positives (fewer than budget 32)
    assert mask.sum() == 64  # remainder filled with negatives


def test_select_training_samples_includes_gt():
    proposals = jnp.asarray([[100, 100, 120, 120]] * 4, jnp.float32)
    prop_valid = jnp.asarray([True] * 4)
    gt = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    gt_labels = jnp.asarray([1])
    gt_valid = jnp.asarray([True])
    boxes, cls, gt_idx, valid, fg = select_training_samples(
        proposals, prop_valid, gt, gt_labels, gt_valid,
        jax.random.PRNGKey(1), num_samples=8, positive_fraction=0.25,
    )
    # the appended GT box must appear as a positive sample with its class
    boxes, cls, fg, valid = map(np.asarray, (boxes, cls, fg, valid))
    pos_rows = boxes[fg]
    assert len(pos_rows) == 1
    np.testing.assert_allclose(pos_rows[0], [0, 0, 10, 10])
    assert cls[fg][0] == 1
    # negatives get class 0
    assert (cls[valid & ~fg] == 0).all()


def test_postprocess_detections_basic():
    # two proposals: one confident class-1, one background-ish
    logits = jnp.asarray([[0.0, 10.0], [5.0, 0.0]], jnp.float32)
    deltas = jnp.zeros((2, 2, 4), jnp.float32)
    proposals = jnp.asarray([[10, 10, 50, 50], [0, 0, 20, 20]], jnp.float32)
    valid = jnp.asarray([True, True])
    boxes, labels, scores, keep = postprocess_detections(
        logits, deltas, proposals, valid, (64, 64), detections_per_img=3
    )
    keep = np.asarray(keep)
    assert keep.sum() == 1
    np.testing.assert_allclose(np.asarray(boxes)[0], [10, 10, 50, 50], atol=1e-4)
    assert int(np.asarray(labels)[0]) == 1
    assert np.asarray(scores)[0] > 0.99


def test_keypoint_heatmap_roundtrip():
    boxes = jnp.asarray([[10.0, 20.0, 66.0, 76.0]])  # 56x56 box
    kps = jnp.asarray([[[12.0, 30.0, 1.0], [60.0, 70.0, 1.0], [5.0, 5.0, 1.0]]])
    idx, vis = keypoints_to_heatmap_targets(kps, boxes, 56)
    vis = np.asarray(vis)
    assert vis[0, 0] and vis[0, 1]
    assert not vis[0, 2]  # outside the box
    # a heatmap peaking at those indices decodes back near the inputs
    hm = np.full((1, 56, 56, 3), -10.0, np.float32)
    ii = np.asarray(idx)
    hm[0, ii[0, 0] // 56, ii[0, 0] % 56, 0] = 10.0
    hm[0, ii[0, 1] // 56, ii[0, 1] % 56, 1] = 10.0
    decoded, scores = heatmaps_to_keypoints(jnp.asarray(hm), boxes)
    decoded = np.asarray(decoded)
    np.testing.assert_allclose(decoded[0, 0, :2], [12.0, 30.0], atol=1.0)
    np.testing.assert_allclose(decoded[0, 1, :2], [60.0, 70.0], atol=1.0)


def test_paste_masks_full_box():
    masks = jnp.ones((1, 28, 28), jnp.float32)
    boxes = jnp.asarray([[8.0, 8.0, 24.0, 24.0]])
    out = np.asarray(paste_masks(masks, boxes, (32, 32)))
    assert out.shape == (1, 32, 32)
    assert out[0, 16, 16] > 0.99  # inside box
    assert out[0, 2, 2] == 0.0  # outside
    inside_area = (out[0] > 0.5).sum()
    assert abs(inside_area - 16 * 16) < 80  # ~box area


def test_greedy_ap_perfect_and_miss():
    targets = [{"boxes": np.array([[0, 0, 10, 10.0]]), "labels": np.array([1])}]
    perfect = [{"boxes": np.array([[0, 0, 10, 10.0]]), "labels": np.array([1]),
                "scores": np.array([0.9])}]
    miss = [{"boxes": np.array([[40, 40, 50, 50.0]]), "labels": np.array([1]),
             "scores": np.array([0.9])}]
    assert greedy_ap(perfect, targets, 0.5) == 1.0
    assert greedy_ap(miss, targets, 0.5) == 0.0


def test_greedy_ap_duplicate_detection_counts_fp():
    # Two detections on one GT. The reference matcher visits predictions in
    # per-image *stored order* (not score order), so the first stored box consumes
    # the GT even though it has the lower score; the higher-scored duplicate
    # becomes a FP ranked first -> AP = 0.5.
    targets = [{"boxes": np.array([[0, 0, 10, 10.0]]), "labels": np.array([1])}]
    preds = [{
        "boxes": np.array([[0, 0, 10, 10.0], [1, 1, 10, 10.0]]),
        "labels": np.array([1, 1]),
        "scores": np.array([0.8, 0.9]),
    }]
    ap = greedy_ap(preds, targets, 0.5)
    np.testing.assert_allclose(ap, 0.5)


def test_keypoint_errors_zero_for_exact():
    kp = np.array([[[10.0, 10, 1], [30, 10, 1], [20, 25, 1]]])
    preds = [{"keypoints": kp.copy(), "boxes": np.zeros((1, 4)),
              "labels": np.array([1]), "scores": np.array([1.0])}]
    targets = [{"keypoints": kp.copy(), "boxes": np.zeros((1, 4)),
                "labels": np.array([1])}]
    m = keypoint_errors(preds, targets)
    assert m["MAE"] == 0.0 and m["NME"] == 0.0


def test_detection_metrics_integration():
    targets = [{
        "boxes": np.array([[0, 0, 10, 10.0], [20, 20, 40, 40]]),
        "labels": np.array([1, 1]),
    }]
    preds = [{
        "boxes": np.array([[0, 0, 10, 10.0], [21, 21, 40, 40]]),
        "labels": np.array([1, 1]),
        "scores": np.array([0.95, 0.8]),
    }]
    m = detection_metrics(preds, targets, thresholds=(0.5,))
    assert m["AP 50"] == 1.0
    assert m["Mean IoU"] == 1.0  # top det matches first gt exactly


def test_postprocess_batch_matches_per_image(rng):
    """Batched (pallas, interpret) postprocess == vmapped reference path."""
    from pets_face_recognition_tpu.models.roi_heads import (
        postprocess_detections_batch,
    )
    import pets_face_recognition_tpu.models.roi_heads as rh_mod
    import pets_face_recognition_tpu.ops.pallas_nms as pn
    import functools

    B, N, C = 3, 24, 3
    logits = jnp.asarray(rng.randn(B, N, C).astype(np.float32) * 2)
    deltas = jnp.asarray(rng.randn(B, N, C, 4).astype(np.float32) * 0.1)
    xy = rng.uniform(0, 50, (B, N, 2)).astype(np.float32)
    wh = rng.uniform(8, 30, (B, N, 2)).astype(np.float32)
    proposals = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    valid = jnp.asarray(rng.rand(B, N) > 0.1)

    # force the pallas path through interpret mode
    orig = pn.nms_keep_sorted_batch
    pn.nms_keep_sorted_batch = functools.partial(orig, interpret=True)
    try:
        bb, bl, bs, bv = postprocess_detections_batch(
            logits, deltas, proposals, valid, (96, 96),
            detections_per_img=8,
        )
    finally:
        pn.nms_keep_sorted_batch = orig

    for b in range(B):
        wb, wl, ws, wv = rh_mod.postprocess_detections(
            logits[b], deltas[b], proposals[b], valid[b], (96, 96),
            detections_per_img=8,
        )
        nb = int(np.asarray(wv).sum())
        assert int(np.asarray(bv[b]).sum()) == nb, f"image {b}"
        np.testing.assert_allclose(np.asarray(bs[b])[:nb],
                                   np.asarray(ws)[:nb], atol=1e-5)
        np.testing.assert_allclose(np.asarray(bb[b])[:nb],
                                   np.asarray(wb)[:nb], atol=1e-3)
        np.testing.assert_array_equal(np.asarray(bl[b])[:nb],
                                      np.asarray(wl)[:nb])


def test_postprocess_batch_top1_fast_path(rng):
    """detections_per_img=1 argmax fast path == the per-image sort+NMS path
    (greedy NMS can never suppress the top-scored box, so the two agree
    exactly, including the lowest-index tie-break)."""
    import pets_face_recognition_tpu.models.roi_heads as rh_mod
    from pets_face_recognition_tpu.models.roi_heads import (
        postprocess_detections_batch,
    )

    B, N, C = 4, 24, 3
    logits = jnp.asarray(rng.randn(B, N, C).astype(np.float32) * 2)
    # duplicate a candidate row to exercise the tie-break
    logits = logits.at[1, 5].set(logits[1, 3])
    deltas = jnp.asarray(rng.randn(B, N, C, 4).astype(np.float32) * 0.1)
    xy = rng.uniform(0, 50, (B, N, 2)).astype(np.float32)
    wh = rng.uniform(8, 30, (B, N, 2)).astype(np.float32)
    proposals = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    valid = jnp.asarray(rng.rand(B, N) > 0.1)

    bb, bl, bs, bv = postprocess_detections_batch(
        logits, deltas, proposals, valid, (96, 96), detections_per_img=1,
    )
    assert bb.shape == (B, 1, 4)
    for b in range(B):
        wb, wl, ws, wv = rh_mod.postprocess_detections(
            logits[b], deltas[b], proposals[b], valid[b], (96, 96),
            detections_per_img=1,
        )
        np.testing.assert_array_equal(np.asarray(bv[b]), np.asarray(wv))
        if bool(np.asarray(wv)[0]):
            np.testing.assert_allclose(np.asarray(bs[b]), np.asarray(ws),
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(bb[b]), np.asarray(wb),
                                       atol=1e-5)
            np.testing.assert_array_equal(np.asarray(bl[b]), np.asarray(wl))
