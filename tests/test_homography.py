"""Homography + warp vs OpenCV (the reference's actual backend, preprocessor/align.py)."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from pets_face_recognition_tpu.ops import align_crop, solve_homography, warp_perspective

BASE_PTS = np.array([[70.0, 92.0], [154.0, 92.0], [112.0, 160.0]], np.float32)


def _ref_align(img, pts, base_pts, dsize):
    """Reference align() semantics re-derived: centroid-augmented findHomography +
    warpPerspective (preprocessor/align.py:5-15)."""
    pts1 = np.concatenate([pts.mean(0, keepdims=True), pts]).astype(np.float32)
    pts2 = np.concatenate([base_pts.mean(0, keepdims=True), base_pts]).astype(
        np.float32
    )
    h, _ = cv2.findHomography(pts1, pts2, cv2.RANSAC)
    return cv2.warpPerspective(img, h, (dsize[1], dsize[0])), h


def _sample_triple(rng):
    """Random non-degenerate landmark triple (reject near-collinear sets, which the
    reference also rejects via its min-distance assert, preprocessor/__init__.py:183-187)."""
    while True:
        pts = rng.uniform(20, 200, (3, 2)).astype(np.float32)
        d1, d2 = pts[1] - pts[0], pts[2] - pts[0]
        area = 0.5 * abs(d1[0] * d2[1] - d1[1] * d2[0])
        if area > 200.0:
            return pts


def test_solve_homography_matches_cv2(rng):
    for _ in range(5):
        pts = _sample_triple(rng)
        pts1 = np.concatenate([pts.mean(0, keepdims=True), pts])
        pts2 = np.concatenate([BASE_PTS.mean(0, keepdims=True), BASE_PTS])
        h_cv, _ = cv2.findHomography(pts1, pts2, cv2.RANSAC)
        h_jax = np.asarray(solve_homography(jnp.asarray(pts1), jnp.asarray(pts2)))
        np.testing.assert_allclose(
            h_jax / h_jax[2, 2], h_cv / h_cv[2, 2], rtol=1e-4, atol=1e-3
        )


def test_solve_homography_overdetermined(rng):
    # exact homography from 6 noiseless correspondences
    H = np.array([[1.2, 0.1, 5.0], [-0.05, 0.9, 3.0], [1e-4, -2e-4, 1.0]], np.float32)
    src = rng.uniform(0, 100, (6, 2)).astype(np.float32)
    ones = np.ones((6, 1), np.float32)
    proj = np.concatenate([src, ones], 1) @ H.T
    dst = proj[:, :2] / proj[:, 2:3]
    got = np.asarray(solve_homography(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(got / got[2, 2], H / H[2, 2], rtol=1e-2, atol=1e-3)


def test_warp_perspective_matches_cv2(rng):
    img = rng.uniform(0, 255, (120, 160, 3)).astype(np.float32)
    pts = np.array([[40.0, 50.0], [110.0, 55.0], [75.0, 100.0]], np.float32)
    ref, h = _ref_align(img, pts, BASE_PTS, (224, 224))
    got = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(h), (224, 224)))
    # interior-pixel agreement (border handling differs by <1px at crop edges)
    diff = np.abs(got - ref)[5:-5, 5:-5]
    assert np.quantile(diff, 0.99) < 3.0, np.quantile(diff, 0.99)
    assert diff.mean() < 0.5


def test_align_crop_batched_matches_cv2(rng):
    # smooth images (like photographs): raw per-pixel noise maximizes the
    # filter-kernel difference between the two-pass and 4-corner bilinear and
    # is not representative of the alignment workload
    imgs = rng.uniform(0, 255, (4, 100, 140, 3)).astype(np.float32)
    imgs = np.stack([cv2.GaussianBlur(i, (0, 0), 1.5) for i in imgs])
    pts = np.stack(
        [
            np.array([[30, 40], [90, 42], [60, 80]], np.float32)
            + rng.uniform(-5, 5, (3, 2)).astype(np.float32)
            for _ in range(4)
        ]
    )
    got = np.asarray(
        jax.jit(lambda i, p: align_crop(i, p, BASE_PTS, (224, 224)))(
            jnp.asarray(imgs), jnp.asarray(pts)
        )
    )
    assert got.shape == (4, 224, 224, 3)
    for b in range(4):
        ref, _ = _ref_align(imgs[b], pts[b], BASE_PTS, (224, 224))
        diff = np.abs(got[b] - ref)[5:-5, 5:-5]
        # the batched path uses the two-pass affine kernel: a sheared-grid
        # bilinear, ~0.25% of pixel range from cv2's 4-corner fixed-point filter
        assert diff.mean() < 1.0, f"batch {b}: mean diff {diff.mean()}"


def test_two_pass_exact_for_scale_translation(rng):
    # with no rotation the sheared grid degenerates to the plain grid: the
    # two-pass kernel must match the projective reference exactly
    from pets_face_recognition_tpu.ops.homography import warp_affine_two_pass

    img = rng.uniform(0, 255, (60, 80, 3)).astype(np.float32)
    H = np.array([[1.7, 0.0, -12.0], [0.0, 2.1, 5.0], [0.0, 0.0, 1.0]],
                 np.float32)
    a = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(H), (96, 96)))
    b = np.asarray(
        warp_affine_two_pass(jnp.asarray(img), jnp.asarray(H), (96, 96))
    )
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_align_maps_landmarks_to_base_points(rng):
    # The defining property: warped landmark positions land on base_pts.
    pts = np.array([[35.0, 45.0], [95.0, 50.0], [65.0, 95.0]], np.float32)
    pts1 = np.concatenate([pts.mean(0, keepdims=True), pts])
    pts2 = np.concatenate([BASE_PTS.mean(0, keepdims=True), BASE_PTS])
    H = np.asarray(solve_homography(jnp.asarray(pts1), jnp.asarray(pts2)))
    proj = np.concatenate([pts, np.ones((3, 1), np.float32)], 1) @ H.T
    mapped = proj[:, :2] / proj[:, 2:3]
    np.testing.assert_allclose(mapped, BASE_PTS, atol=1e-2)
