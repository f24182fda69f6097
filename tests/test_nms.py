"""NMS vs a trivially-correct greedy reference (torchvision semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from pets_face_recognition_tpu.ops import batched_nms, nms


def _greedy_nms(boxes, scores, thr):
    """Plain-python exact greedy NMS, returns kept indices in score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            x1 = max(boxes[i, 0], boxes[j, 0]); y1 = max(boxes[i, 1], boxes[j, 1])
            x2 = min(boxes[i, 2], boxes[j, 2]); y2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
            ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            aj = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / (ai + aj - inter) if ai + aj - inter > 0 else 0.0
            if scores[j] < scores[i] or (scores[j] == scores[i] and j != i):
                if iou > thr:
                    suppressed[j] = True
    return keep


def _rand(rng, n, size=60.0):
    xy = rng.uniform(0, size, (n, 2)).astype(np.float32)
    wh = rng.uniform(5, size / 2, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


def test_nms_matches_greedy_reference(rng):
    for trial in range(5):
        boxes, scores = _rand(rng, 64)
        want = _greedy_nms(boxes, scores, 0.5)
        idx, valid = jax.jit(lambda b, s: nms(b, s, 0.5, 64))(
            jnp.asarray(boxes), jnp.asarray(scores)
        )
        got = list(np.asarray(idx)[np.asarray(valid)])
        assert got == want, f"trial {trial}"


def test_nms_fixed_output_shape_and_padding(rng):
    boxes, scores = _rand(rng, 32)
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.9, 8)
    assert idx.shape == (8,) and valid.shape == (8,)
    n_kept = int(valid.sum())
    # padded slots come after valid ones
    assert not np.asarray(valid)[n_kept:].any()


def test_nms_respects_validity_mask(rng):
    boxes, scores = _rand(rng, 16)
    valid_in = np.zeros(16, bool)
    valid_in[:4] = True
    idx, valid = nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 16, valid=jnp.asarray(valid_in)
    )
    kept = np.asarray(idx)[np.asarray(valid)]
    assert set(kept).issubset(set(range(4)))


def test_nms_score_threshold(rng):
    boxes = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
    scores = jnp.asarray([0.9, 0.05])
    idx, valid = nms(boxes, scores, 0.5, 2, score_threshold=0.1)
    assert int(valid.sum()) == 1
    assert int(idx[0]) == 0


def test_batched_nms_classes_dont_interact(rng):
    # identical overlapping boxes but different class ids: both survive
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    idxs = jnp.asarray([0, 1])
    _, valid = batched_nms(boxes, scores, idxs, 0.5, 2)
    assert int(valid.sum()) == 2
    _, valid_same = batched_nms(boxes, scores, jnp.asarray([0, 0]), 0.5, 2)
    assert int(valid_same.sum()) == 1
