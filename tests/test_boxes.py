"""Box math vs independent numpy references."""

import numpy as np
import jax.numpy as jnp

from pets_face_recognition_tpu.ops import (
    clip_boxes,
    decode_boxes,
    encode_boxes,
    pairwise_iou,
)
from pets_face_recognition_tpu.ops.anchors import (
    generate_anchors,
    grid_anchors,
    multilevel_anchors,
)


def _np_iou(a, b):
    out = np.zeros((len(a), len(b)))
    for i, bi in enumerate(a):
        for j, bj in enumerate(b):
            x1 = max(bi[0], bj[0]); y1 = max(bi[1], bj[1])
            x2 = min(bi[2], bj[2]); y2 = min(bi[3], bj[3])
            inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
            ua = (bi[2] - bi[0]) * (bi[3] - bi[1])
            ub = (bj[2] - bj[0]) * (bj[3] - bj[1])
            out[i, j] = inter / (ua + ub - inter) if ua + ub - inter > 0 else 0.0
    return out


def _rand_boxes(rng, n, size=100.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_pairwise_iou_matches_naive(rng):
    a = _rand_boxes(rng, 13)
    b = _rand_boxes(rng, 7)
    got = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _np_iou(a, b), atol=1e-5)


def test_encode_decode_roundtrip(rng):
    anchors = _rand_boxes(rng, 50)
    gt = _rand_boxes(rng, 50)
    deltas = encode_boxes(jnp.asarray(gt), jnp.asarray(anchors))
    rec = decode_boxes(deltas, jnp.asarray(anchors))
    np.testing.assert_allclose(np.asarray(rec), gt, atol=5e-3)


def test_decode_clamps_extreme_deltas(rng):
    anchors = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    deltas = jnp.asarray([[0.0, 0.0, 50.0, 50.0]])  # exp(50) would overflow
    out = np.asarray(decode_boxes(deltas, anchors))
    assert np.isfinite(out).all()
    assert (out[0, 2] - out[0, 0]) <= 10 * 1000 / 16 + 1


def test_clip_boxes():
    boxes = jnp.asarray([[-5.0, -5.0, 120.0, 90.0], [10.0, 10.0, 20.0, 20.0]])
    out = np.asarray(clip_boxes(boxes, (80, 100)))  # H=80, W=100
    np.testing.assert_allclose(out[0], [0, 0, 100, 80])
    np.testing.assert_allclose(out[1], [10, 10, 20, 20])


def test_generate_anchors_torchvision_convention():
    base = generate_anchors((32.0,), (1.0,))
    np.testing.assert_allclose(base, [[-16, -16, 16, 16]], atol=1e-5)
    base = generate_anchors((32.0,), (2.0,))  # taller than wide: h = s*sqrt(2)
    w = base[0, 2] - base[0, 0]
    h = base[0, 3] - base[0, 1]
    assert h > w
    np.testing.assert_allclose(h / w, 2.0, atol=1e-5)
    np.testing.assert_allclose(w * h, 32 * 32, atol=1e-2)


def test_grid_anchors_layout():
    base = generate_anchors((8.0,), (1.0,))
    anchors = grid_anchors((2, 3), 4, base)
    assert anchors.shape == (6, 4)
    # first anchor centered at (0, 0), second at (4, 0) (x fastest)
    np.testing.assert_allclose(anchors[0], [-4, -4, 4, 4])
    np.testing.assert_allclose(anchors[1], [0, -4, 8, 4])
    np.testing.assert_allclose(anchors[3], [-4, 0, 4, 8])


def test_multilevel_anchor_count():
    a = multilevel_anchors(
        [(8, 8), (4, 4)], [8, 16], ((32.0,), (64.0,)), aspect_ratios=(0.5, 1.0, 2.0)
    )
    assert a.shape == ((64 + 16) * 3, 4)
