"""Pallas warp kernel (interpret mode) vs the exact projective reference.

The production homographies carry small perspective terms (the reference
rounds the prepended centroids, preprocessor/align.py:8-9), so ``_alignment_H``
keeps the full projective matrix — the kernel's rational divide must match
``warp_perspective`` exactly, not just on affine maps."""

import numpy as np
import jax.numpy as jnp

from pets_face_recognition_tpu.ops.homography import (
    solve_homography,
    warp_perspective,
)
from pets_face_recognition_tpu.ops.pallas_warp import warp_affine_batch_pallas

BASE = np.array([[70.0, 92.0], [154.0, 92.0], [112.0, 160.0]], np.float32)


def _alignment_H(pts):
    pts = np.round(pts)  # reference rounds detector keypoints to int (:181)
    p1 = np.concatenate([np.round(pts.mean(0, keepdims=True)), pts])
    p2 = np.concatenate([np.round(BASE.mean(0, keepdims=True)), BASE])
    return np.array(solve_homography(jnp.asarray(p1), jnp.asarray(p2)))


def test_pallas_warp_matches_projective_reference(rng):
    B = 3
    imgs = rng.uniform(0, 255, (B, 320, 320, 3)).astype(np.float32)
    Hs = []
    for b in range(B):
        pts = np.array([[100, 120], [200, 118 + 10 * b], [150, 190]],
                       np.float32) + rng.uniform(-15, 15, (3, 2)).astype(
                           np.float32)
        Hs.append(_alignment_H(pts))
    Hs = np.stack(Hs)

    got = np.asarray(warp_affine_batch_pallas(
        jnp.asarray(imgs), jnp.asarray(Hs), (224, 224), interpret=True,
    ))
    for b in range(B):
        want = np.asarray(warp_perspective(
            jnp.asarray(imgs[b]), jnp.asarray(Hs[b]), (224, 224)
        ))
        np.testing.assert_allclose(got[b], want, atol=3e-2,
                                   err_msg=f"batch {b}")


def test_pallas_warp_identity_and_scale(rng):
    img = rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    H = np.eye(3, dtype=np.float32)[None]
    out = np.asarray(warp_affine_batch_pallas(
        jnp.asarray(img), jnp.asarray(H), (64, 64), interpret=True,
    ))
    np.testing.assert_allclose(out[0], img[0], atol=1e-3)

    H2 = np.diag([2.0, 2.0, 1.0]).astype(np.float32)[None]  # 2x zoom out
    out2 = np.asarray(warp_affine_batch_pallas(
        jnp.asarray(img), jnp.asarray(H2), (64, 64), interpret=True,
    ))
    want2 = np.asarray(warp_perspective(jnp.asarray(img[0]), jnp.asarray(H2[0]),
                                        (64, 64)))
    np.testing.assert_allclose(out2[0], want2, atol=1e-3)


def test_pallas_warp_int8_close_to_f32(rng):
    """int8 serving mode (symmetric, scale 127): quantization error bounded by
    ~1% of the pixel range ([0, 1] inputs required by the int8 path)."""
    B = 2
    imgs = rng.uniform(0, 1, (B, 320, 320, 3)).astype(np.float32)
    Hs = []
    for b in range(B):
        pts = np.array([[100, 120], [200, 118 + 10 * b], [150, 190]],
                       np.float32) + rng.uniform(-15, 15, (3, 2)).astype(
                           np.float32)
        Hs.append(_alignment_H(pts))
    Hs = np.stack(Hs)

    f32 = np.asarray(warp_affine_batch_pallas(
        jnp.asarray(imgs), jnp.asarray(Hs), (224, 224), interpret=True,
    ))
    i8 = np.asarray(warp_affine_batch_pallas(
        jnp.asarray(imgs), jnp.asarray(Hs), (224, 224), interpret=True,
        compute_dtype=jnp.int8,
    ))
    assert np.abs(f32 - i8).max() < 1.2e-2


def test_pallas_warp_v3_matches_projective_reference(rng):
    from pets_face_recognition_tpu.ops.pallas_warp import (
        warp_affine_batch_pallas_v3,
    )

    B = 3
    imgs = rng.uniform(0, 255, (B, 320, 320, 3)).astype(np.float32)
    Hs = []
    for b in range(B):
        pts = np.array([[100, 120], [200, 118 + 10 * b], [150, 190]],
                       np.float32) + rng.uniform(-15, 15, (3, 2)).astype(
                           np.float32)
        Hs.append(_alignment_H(pts))
    Hs = np.stack(Hs)

    got = np.asarray(warp_affine_batch_pallas_v3(
        jnp.asarray(imgs), jnp.asarray(Hs), (224, 224), interpret=True,
    ))
    for b in range(B):
        want = np.asarray(warp_perspective(
            jnp.asarray(imgs[b]), jnp.asarray(Hs[b]), (224, 224)
        ))
        np.testing.assert_allclose(got[b], want, atol=3e-2,
                                   err_msg=f"batch {b}")
