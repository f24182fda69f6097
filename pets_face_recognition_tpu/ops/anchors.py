"""Anchor generation for the RPN.

Replaces torchvision's ``AnchorGenerator`` (referenced at
``/root/reference/models/detection/rcnn.py:4,38,70``; used implicitly by the production
Mask/Keypoint R-CNNs, SURVEY.md §2.10). Matches torchvision semantics:

- per-level base anchors are centered at 0, ``round``-free (float), built from
  ``sizes × aspect_ratios``;
- grid anchors place base anchors at stride-spaced centers ``(x*stride, y*stride)``;
- all shapes are static given the feature-map sizes, so the result is a compile-time
  constant under jit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def generate_anchors(
    sizes: tuple[float, ...],
    aspect_ratios: tuple[float, ...],
    dtype=np.float32,
) -> np.ndarray:
    """Zero-centered base anchors of shape ``(len(sizes)*len(aspect_ratios), 4)``.

    torchvision convention: ``h = size*sqrt(ar)``, ``w = size/sqrt(ar)``.
    """
    sizes = np.asarray(sizes, dtype=dtype)
    aspect_ratios = np.asarray(aspect_ratios, dtype=dtype)
    h_ratios = np.sqrt(aspect_ratios)
    w_ratios = 1.0 / h_ratios
    ws = (w_ratios[:, None] * sizes[None, :]).reshape(-1)
    hs = (h_ratios[:, None] * sizes[None, :]).reshape(-1)
    base = np.stack([-ws, -hs, ws, hs], axis=1) / 2.0
    return base.astype(dtype)


def grid_anchors(
    feature_size: tuple[int, int],
    stride: tuple[int, int] | int,
    base_anchors: np.ndarray,
) -> np.ndarray:
    """All anchors for one feature level: ``(H*W*A, 4)`` xyxy, row-major over (y, x, a)."""
    fh, fw = feature_size
    if isinstance(stride, int):
        stride = (stride, stride)
    sy, sx = stride
    shifts_x = np.arange(fw, dtype=np.float32) * sx
    shifts_y = np.arange(fh, dtype=np.float32) * sy
    shift_y, shift_x = np.meshgrid(shifts_y, shifts_x, indexing="ij")
    shifts = np.stack(
        [shift_x.ravel(), shift_y.ravel(), shift_x.ravel(), shift_y.ravel()], axis=1
    )
    anchors = shifts[:, None, :] + base_anchors[None, :, :]
    return anchors.reshape(-1, 4).astype(np.float32)


def multilevel_anchors(
    feature_sizes: list[tuple[int, int]],
    strides: list[int],
    sizes_per_level: tuple[tuple[float, ...], ...],
    aspect_ratios: tuple[float, ...] = (0.5, 1.0, 2.0),
) -> jnp.ndarray:
    """Concatenate grid anchors over FPN levels → ``(sum_l H_l*W_l*A, 4)``.

    Mirrors torchvision's FPN default of one size tuple per level
    (e.g. ``((32,),(64,),(128,),(256,),(512,))`` for maskrcnn_resnet50_fpn).

    Built with jnp iota (not a numpy literal): a 320² pyramid has ~25k anchors,
    and embedding them as an HLO constant bloats the serialized module past the
    remote-compiler's request limits; in-graph generation is a few fused ops.
    """
    per_level = []
    for fsize, stride, sizes in zip(feature_sizes, strides, sizes_per_level):
        fh, fw = fsize
        base = jnp.asarray(generate_anchors(tuple(sizes), aspect_ratios))
        sy = jax.lax.broadcasted_iota(jnp.float32, (fh, fw), 0) * stride
        sx = jax.lax.broadcasted_iota(jnp.float32, (fh, fw), 1) * stride
        shifts = jnp.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
        per_level.append((shifts + base[None, :, :]).reshape(-1, 4))
    return jnp.concatenate(per_level, axis=0)
