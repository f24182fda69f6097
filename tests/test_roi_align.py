"""RoIAlign vs an independent scalar-loop reference (torchvision numerics)."""

import numpy as np
import jax
import jax.numpy as jnp

from pets_face_recognition_tpu.ops import roi_align


def _ref_roi_align(feat, rois, batch_idx, out_size, scale, ratio, aligned):
    """Scalar re-implementation of torchvision's roi_align semantics."""
    B, H, W, C = feat.shape
    oh, ow = out_size
    K = len(rois)
    out = np.zeros((K, oh, ow, C), np.float32)
    off = 0.5 if aligned else 0.0
    for k in range(K):
        b = batch_idx[k]
        x1, y1, x2, y2 = rois[k] * scale - off
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bh, bw = rh / oh, rw / ow
        for i in range(oh):
            for j in range(ow):
                acc = np.zeros(C, np.float32)
                for p in range(ratio):
                    for q in range(ratio):
                        y = y1 + (i + (p + 0.5) / ratio) * bh
                        x = x1 + (j + (q + 0.5) / ratio) * bw
                        acc += _bilinear(feat[b], y, x)
                out[k, i, j] = acc / (ratio * ratio)
    return out


def _bilinear(img, y, x):
    H, W, C = img.shape
    if y <= -1.0 or y >= H or x <= -1.0 or x >= W:
        return np.zeros(C, np.float32)
    y, x = max(y, 0.0), max(x, 0.0)
    yl, xl = int(np.floor(y)), int(np.floor(x))
    if yl >= H - 1:
        yl = yh = H - 1
        y = float(yl)
    else:
        yh = yl + 1
    if xl >= W - 1:
        xl = xh = W - 1
        x = float(xl)
    else:
        xh = xl + 1
    ly, lx = y - yl, x - xl
    return (
        img[yl, xl] * (1 - ly) * (1 - lx)
        + img[yl, xh] * (1 - ly) * lx
        + img[yh, xl] * ly * (1 - lx)
        + img[yh, xh] * ly * lx
    ).astype(np.float32)


def test_roi_align_matches_reference(rng):
    feat = rng.randn(2, 16, 20, 8).astype(np.float32)
    rois = np.array(
        [
            [8.0, 8.0, 40.0, 32.0],
            [0.0, 0.0, 80.0, 64.0],
            [-4.0, -4.0, 12.0, 12.0],  # partially out of range
            [30.0, 10.0, 31.0, 11.0],  # tiny
        ],
        np.float32,
    )
    bidx = np.array([0, 1, 0, 1], np.int32)
    for aligned in (False, True):
        got = np.asarray(
            jax.jit(
                lambda f, r, b: roi_align(
                    f, r, b, (7, 7), spatial_scale=0.25, sampling_ratio=2,
                    aligned=aligned,
                )
            )(jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(bidx))
        )
        want = _ref_roi_align(feat, rois, bidx, (7, 7), 0.25, 2, aligned)
        np.testing.assert_allclose(got, want, atol=1e-4, err_msg=f"aligned={aligned}")


def test_roi_align_shapes(rng):
    feat = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    rois = jnp.asarray(rng.uniform(0, 8, (5, 4)).astype(np.float32))
    out = roi_align(feat, rois, jnp.zeros(5, jnp.int32), (14, 14), 1.0, 2)
    assert out.shape == (5, 14, 14, 4)


def test_project_masks_dense_matches_gather_roi_align():
    """The dense two-matmul mask projection (models/roi_heads.py round-5)
    must reproduce the gather-based roi_align numbers exactly (bilinear
    sampling factorizes per axis; edge rules included — boxes hang off
    every image edge here)."""
    import numpy as np
    import jax.numpy as jnp

    from pets_face_recognition_tpu.models.roi_heads import (
        project_masks_on_boxes,
    )
    from pets_face_recognition_tpu.ops.roi_align import roi_align

    rng = np.random.RandomState(0)
    G, H, W, K, size = 4, 96, 80, 16, 28
    masks = (rng.rand(G, H, W) > 0.5).astype(np.float32)
    x1 = rng.uniform(-20, 70, K)
    y1 = rng.uniform(-20, 80, K)
    boxes = np.stack([x1, y1, x1 + rng.uniform(0.5, 60, K),
                      y1 + rng.uniform(0.5, 60, K)], -1).astype(np.float32)
    idx = rng.randint(0, G, K)

    new = np.asarray(project_masks_on_boxes(
        jnp.asarray(masks), jnp.asarray(boxes), jnp.asarray(idx), size))
    old = np.asarray(roi_align(
        jnp.asarray(masks)[idx][..., None], jnp.asarray(boxes),
        jnp.arange(K, dtype=jnp.int32), (size, size),
        spatial_scale=1.0, sampling_ratio=2, aligned=False))[..., 0]
    np.testing.assert_allclose(new, old, atol=1e-6)
