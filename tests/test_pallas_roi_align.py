"""Pallas multilevel RoIAlign (interpret mode) vs the XLA reference path."""

import numpy as np
import jax.numpy as jnp

from pets_face_recognition_tpu.ops.roi_align import multilevel_roi_align
from pets_face_recognition_tpu.ops.pallas_roi_align import (
    multilevel_roi_align_pallas,
)


def _pyramid(rng, B=2, C=32):
    sizes = [(40, 40), (20, 20), (10, 10), (5, 5)]
    return [jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
            for h, w in sizes]


def _level_realistic_rois(rng, B, per_image, image_size=160):
    """RoIs whose sizes land across all FPN levels (canonical mapper regime)."""
    rois, bidx = [], []
    for b in range(B):
        for _ in range(per_image):
            # sample target level then size so the mapper assigns that level
            k = rng.randint(2, 6)
            s = 224.0 * (2.0 ** (k - 4)) * rng.uniform(1.0, 1.9)
            s = min(s, image_size * 0.9)
            ar = rng.uniform(0.6, 1.6)
            w = s * np.sqrt(ar)
            h = s / np.sqrt(ar)
            x1 = rng.uniform(0, max(image_size - w, 1))
            y1 = rng.uniform(0, max(image_size - h, 1))
            rois.append([x1, y1, x1 + w, y1 + h])
            bidx.append(b)
    return (np.asarray(rois, np.float32), np.asarray(bidx, np.int32))


def test_pallas_roi_align_matches_xla(rng):
    B, per = 2, 8
    feats = _pyramid(rng, B)
    rois, bidx = _level_realistic_rois(rng, B, per)
    strides = (4, 8, 16, 32)

    want = np.asarray(multilevel_roi_align(
        feats, jnp.asarray(rois), jnp.asarray(bidx), (7, 7), strides,
    ))
    got = np.asarray(multilevel_roi_align_pallas(
        feats, jnp.asarray(rois), jnp.asarray(bidx), (7, 7), strides,
        interpret=True, compute_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)

    # bf16 production mode stays within quantization error
    got16 = np.asarray(multilevel_roi_align_pallas(
        feats, jnp.asarray(rois), jnp.asarray(bidx), (7, 7), strides,
        interpret=True,
    ))
    assert np.abs(got16 - want).max() < 0.05


def test_pallas_roi_align_chunked_rois_per_program(rng):
    """R values that select CH=2 (R=6) and CH=1 (R=5) match the XLA path —
    pins the multi-RoI-per-program chunking (R=8/CH=8 is covered above)."""
    B = 2
    feats = _pyramid(rng, B)
    strides = (4, 8, 16, 32)
    for per in (6, 5):
        rois, bidx = _level_realistic_rois(rng, B, per)
        want = np.asarray(multilevel_roi_align(
            feats, jnp.asarray(rois), jnp.asarray(bidx), (7, 7), strides,
        ))
        got = np.asarray(multilevel_roi_align_pallas(
            feats, jnp.asarray(rois), jnp.asarray(bidx), (7, 7), strides,
            interpret=True, compute_dtype=jnp.float32,
        ))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_pallas_roi_align_oob_rois(rng):
    """Partially out-of-range RoIs still agree (zero-padding rules)."""
    B = 1
    feats = _pyramid(rng, B)
    rois = np.asarray(
        [[-8.0, -8.0, 60.0, 60.0], [100.0, 100.0, 200.0, 200.0]], np.float32
    )
    bidx = np.zeros(2, np.int32)
    strides = (4, 8, 16, 32)
    want = np.asarray(multilevel_roi_align(
        feats, jnp.asarray(rois), jnp.asarray(bidx), (7, 7), strides,
    ))
    got = np.asarray(multilevel_roi_align_pallas(
        feats, jnp.asarray(rois), jnp.asarray(bidx), (7, 7), strides,
        interpret=True, compute_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_pallas_roi_align_gradients_match_xla(rng):
    """Custom-VJP backward (interpret) == autodiff through the XLA path."""
    import jax
    from pets_face_recognition_tpu.ops.pallas_roi_align import (
        multilevel_roi_align_pallas_diff,
    )

    B, per = 2, 8  # R=8 selects CH=8 in both fwd and bwd chunked kernels
    feats = _pyramid(rng, B, C=8)
    rois, bidx = _level_realistic_rois(rng, B, per)
    strides = (4, 8, 16, 32)
    cotangent = rng.randn(B * per, 7, 7, 8).astype(np.float32)

    def loss_xla(fs):
        out = multilevel_roi_align(fs, jnp.asarray(rois), jnp.asarray(bidx),
                                   (7, 7), strides)
        return jnp.sum(out * jnp.asarray(cotangent))

    def loss_pallas(fs):
        out = multilevel_roi_align_pallas_diff(
            fs, jnp.asarray(rois), jnp.asarray(bidx), (7, 7), strides,
            interpret=True, compute_dtype=jnp.float32,
        )
        return jnp.sum(out * jnp.asarray(cotangent))

    g_xla = jax.grad(lambda fs: loss_xla(list(fs)))(tuple(feats))
    g_pal = jax.grad(lambda fs: loss_pallas(list(fs)))(tuple(feats))
    for lvl, (a, b) in enumerate(zip(g_xla, g_pal)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=1e-3,
            err_msg=f"level {lvl}",
        )


def test_dense_roi_align_matches_gather(rng):
    """multilevel_roi_align_dense (whole-level einsum form) == gather path."""
    from pets_face_recognition_tpu.ops.roi_align import (
        multilevel_roi_align_dense,
    )

    B, per = 2, 16
    sizes = [(20, 20), (10, 10), (5, 5)]
    feats = [jnp.asarray(rng.randn(B, h, w, 32).astype(np.float32))
             for h, w in sizes]
    rois = []
    for _ in range(B * per):
        s = rng.uniform(20, 280)
        w = s * rng.uniform(0.7, 1.4)
        h = s * s / w
        x1 = rng.uniform(-10, 320 - w)
        y1 = rng.uniform(-10, 320 - h)
        rois.append([x1, y1, x1 + w, y1 + h])
    rois = jnp.asarray(np.asarray(rois, np.float32))
    bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), per)
    strides = (16, 32, 64)

    want = np.asarray(multilevel_roi_align(
        feats, rois, bidx, (7, 7), strides, min_level=4, max_level=6,
    ))
    got = np.asarray(multilevel_roi_align_dense(
        feats, rois, bidx, (7, 7), strides, min_level=4, max_level=6,
        compute_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)

    got16 = np.asarray(multilevel_roi_align_dense(
        feats, rois, bidx, (7, 7), strides, min_level=4, max_level=6,
    ))
    assert np.abs(got16 - want).max() < 0.05
