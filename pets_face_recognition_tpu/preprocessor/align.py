"""Alignment API (reference ``preprocessor/align.py`` surface).

``align(img, pts, base_pts, dsize)`` keeps the reference's single-image signature
(``/root/reference/preprocessor/align.py:5-15``) but runs the jitted JAX solve+warp;
``align_batch`` is the TPU-native batched path used by the pipelines.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.homography import align_crop, solve_homography, warp_perspective

__all__ = ["align", "align_batch", "solve_homography", "warp_perspective"]


@partial(jax.jit, static_argnames=("dsize",))
def _align_one(img, pts, base_pts, dsize):
    return align_crop(img[None], pts[None], base_pts, dsize)[0]


def align(img: np.ndarray, pts, base_pts, dsize) -> np.ndarray:
    """Single-image centroid-augmented homography alignment.

    ``dsize`` accepts the reference's ``(H, W, C)`` tuples (channel entry ignored).
    """
    out_hw = tuple(dsize[:2])
    out = _align_one(
        jnp.asarray(img, jnp.float32),
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(base_pts, jnp.float32),
        out_hw,
    )
    return np.asarray(out)


def align_batch(images, landmarks, base_pts, dsize) -> jnp.ndarray:
    """Batched alignment: ``(B, H, W, C) × (B, 3, 2) → (B, out_h, out_w, C)``."""
    return align_crop(images, landmarks, base_pts, tuple(dsize[:2]))
