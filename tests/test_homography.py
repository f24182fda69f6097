"""Homography + warp vs the REAL reference ``align()`` (preprocessor/align.py).

The oracle is the reference's own code imported from ``/root/reference`` (cv2 +
numpy only) — not a re-derivation that can go stale. The reference ROUNDS both
prepended centroids to ints (``preprocessor/align.py:8-9``), which makes the
exact 4-point homography slightly projective; every path here (batched
``align_crop``, the Pallas kernel, ``Preproc3``'s host-cv2 compat loop) must
reproduce that rounded-centroid projective warp.
"""

import importlib.util
from pathlib import Path

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from pets_face_recognition_tpu.ops import align_crop, solve_homography, warp_perspective

BASE_PTS = np.array([[70.0, 92.0], [154.0, 92.0], [112.0, 160.0]], np.float32)

_REF_ALIGN_PATH = Path("/root/reference/preprocessor/align.py")


def _load_ref_align():
    spec = importlib.util.spec_from_file_location("_ref_align_mod",
                                                  _REF_ALIGN_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.align


ref_align = _load_ref_align()


def _ref_h(pts, base_pts):
    """The reference's homography: rounded-centroid 4-point cv2.findHomography
    (preprocessor/align.py:8-13)."""
    pts1 = np.asarray(
        [np.round(np.mean(pts, axis=0)).astype(int)] + np.asarray(pts).tolist()
    )
    pts2 = np.asarray(
        [np.round(np.mean(base_pts, axis=0)).astype(int)]
        + np.asarray(base_pts).tolist()
    )
    h, _ = cv2.findHomography(pts1, pts2, method=cv2.RANSAC)
    return pts1, pts2, h


def _sample_triple(rng):
    """Random non-degenerate INT landmark triple (the reference rounds detector
    keypoints to int before aligning, preprocessor/__init__.py:181; it rejects
    near-collinear sets via its min-distance assert, :183-187)."""
    while True:
        pts = np.round(rng.uniform(20, 200, (3, 2))).astype(np.float32)
        d1, d2 = pts[1] - pts[0], pts[2] - pts[0]
        area = 0.5 * abs(d1[0] * d2[1] - d1[1] * d2[0])
        if area > 200.0:
            return pts


def test_solve_homography_matches_cv2(rng):
    for _ in range(5):
        pts = _sample_triple(rng)
        pts1, pts2, h_cv = _ref_h(pts, BASE_PTS)
        h_jax = np.asarray(
            solve_homography(jnp.asarray(pts1, jnp.float32),
                             jnp.asarray(pts2, jnp.float32))
        )
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
    ref = ref_align(img, pts, BASE_PTS, (224, 224, 3))
    _, _, h = _ref_h(pts, BASE_PTS)
    got = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(h), (224, 224)))
    # interior-pixel agreement (border handling differs by <1px at crop edges)
    diff = np.abs(got - ref)[5:-5, 5:-5]
    assert np.quantile(diff, 0.99) < 3.0, np.quantile(diff, 0.99)
    assert diff.mean() < 0.5


def test_align_crop_batched_matches_reference_align(rng):
    """The batched device path vs the real reference ``align()``."""
    imgs = rng.uniform(0, 255, (4, 104, 144, 3)).astype(np.float32)
    imgs = np.stack([cv2.GaussianBlur(i, (0, 0), 1.5) for i in imgs])
    pts = np.stack(
        [
            np.round(
                np.array([[30, 40], [90, 42], [60, 80]], np.float32)
                + rng.uniform(-5, 5, (3, 2))
            ).astype(np.float32)
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
        ref = ref_align(imgs[b], pts[b], BASE_PTS, (224, 224, 3))
        diff = np.abs(got[b] - ref)[5:-5, 5:-5]
        # cv2 interpolates with 5-bit fixed-point weights; exact-H float paths
        # land well under 1 unit of the 255 range on smooth images
        assert diff.mean() < 1.0, f"batch {b}: mean diff {diff.mean()}"
        assert np.quantile(diff, 0.99) < 6.0


def test_all_alignment_paths_identical(rng):
    """batched align_crop, the Pallas kernel (interpret), and Preproc3's
    host-cv2 compat formula must emit the SAME crop (and match the reference
    oracle) — the round-2 regression was two alignment semantics in one tree."""
    from pets_face_recognition_tpu.ops.pallas_warp import warp_affine_batch_pallas

    imgs = rng.uniform(0, 255, (2, 104, 144, 3)).astype(np.float32)
    imgs = np.stack([cv2.GaussianBlur(i, (0, 0), 1.5) for i in imgs])
    pts = np.stack(
        [
            np.round(
                np.array([[32, 41], [88, 45], [58, 82]], np.float32)
                + rng.uniform(-4, 4, (3, 2))
            ).astype(np.float32)
            for _ in range(2)
        ]
    )

    # path 1: batched align_crop (CPU backend -> vmap warp_perspective)
    batched = np.asarray(
        align_crop(jnp.asarray(imgs), jnp.asarray(pts), BASE_PTS, (224, 224))
    )

    # path 2: Pallas kernel on the same rounded-centroid homography
    src4 = np.concatenate([np.round(pts.mean(1, keepdims=True)), pts], axis=1)
    dst4 = np.concatenate(
        [np.round(BASE_PTS.mean(0, keepdims=True)), BASE_PTS], axis=0
    )
    Hs = np.asarray(
        solve_homography(jnp.asarray(src4),
                         jnp.broadcast_to(jnp.asarray(dst4), (2, 4, 2)))
    )
    pad = np.zeros((2, 104, 144 + 112, 3), np.float32)  # pallas: W mult of 128
    pad[:, :, :144] = imgs
    pallas = np.asarray(warp_affine_batch_pallas(
        jnp.asarray(pad), jnp.asarray(Hs), (224, 224), interpret=True
    ))

    # path 3: Preproc3.batch's host compat loop (cv2 warp of OUR H)
    compat = np.stack([
        cv2.warpPerspective(imgs[b], Hs[b], (224, 224)) for b in range(2)
    ])

    for b in range(2):
        ref = ref_align(imgs[b], pts[b], BASE_PTS, (224, 224, 3))
        for name, out in [("batched", batched), ("pallas", pallas),
                          ("compat", compat)]:
            diff = np.abs(out[b] - ref)[5:-5, 5:-5]
            assert diff.mean() < 1.0, f"{name}[{b}]: mean diff {diff.mean()}"
        # the three in-tree paths agree to float/interp noise with each other
        np.testing.assert_allclose(batched[b], pallas[b], atol=0.35,
                                   err_msg=f"batched vs pallas [{b}]")
        np.testing.assert_allclose(batched[b], compat[b], atol=2.5,
                                   err_msg=f"batched vs compat [{b}]")


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
    # The defining property survives centroid rounding: the 4-point homography
    # is exact on all 4 correspondences, so the 3 landmarks still land on
    # base_pts exactly.
    pts = np.array([[35.0, 45.0], [95.0, 50.0], [65.0, 95.0]], np.float32)
    pts1 = np.concatenate([np.round(pts.mean(0, keepdims=True)), pts])
    pts2 = np.concatenate([np.round(BASE_PTS.mean(0, keepdims=True)), BASE_PTS])
    H = np.asarray(solve_homography(jnp.asarray(pts1), jnp.asarray(pts2)))
    proj = np.concatenate([pts, np.ones((3, 1), np.float32)], 1) @ H.T
    mapped = proj[:, :2] / proj[:, 2:3]
    np.testing.assert_allclose(mapped, BASE_PTS, atol=1e-2)
