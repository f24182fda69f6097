"""Mask pasting: box-frame 28×28 mask logits → full-image masks.

Replaces torchvision's ``paste_masks_in_image`` (used inside Mask R-CNN
post-processing, which the reference relies on for mask IoU scoring and the
mask-multiply body crop, ``preprocessor/__init__.py:238-243``).

torchvision semantics: bilinear-resize each mask to its (integer-expanded) box and
paste; equivalently each image pixel samples the mask at
``m = (p + 0.5 - x1) / box_w * S - 0.5`` (align_corners=False). Zero outside the box.
Static-shape: output is always ``(D, H, W)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def paste_masks(
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    image_size: tuple[int, int],
) -> jnp.ndarray:
    """``masks (D, S, S)`` probabilities + ``boxes (D, 4)`` xyxy → ``(D, H, W)``."""
    D, S, _ = masks.shape
    H, W = image_size
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)

    xs = jnp.arange(W, dtype=jnp.float32)[None, :]  # (1, W)
    ys = jnp.arange(H, dtype=jnp.float32)[None, :]  # (1, H)
    mx = (xs + 0.5 - x1[:, None]) / bw[:, None] * S - 0.5  # (D, W)
    my = (ys + 0.5 - y1[:, None]) / bh[:, None] * S - 0.5  # (D, H)

    def sample_1d(coord, size):
        c0 = jnp.floor(coord)
        frac = coord - c0
        c0 = c0.astype(jnp.int32)
        c1 = c0 + 1
        in0 = (c0 >= 0) & (c0 < size)
        in1 = (c1 >= 0) & (c1 < size)
        return (jnp.clip(c0, 0, size - 1), jnp.clip(c1, 0, size - 1),
                frac, in0, in1)

    x0, x1i, fx, inx0, inx1 = sample_1d(mx, S)
    y0, y1i, fy, iny0, iny1 = sample_1d(my, S)

    def per_mask(m, x0_, x1_, fx_, inx0_, inx1_, y0_, y1_, fy_, iny0_, iny1_):
        # gather rows then columns (separable bilinear)
        row0 = m[y0_]  # (H, S)
        row1 = m[y1_]
        row0 = jnp.where(iny0_[:, None], row0, 0.0)
        row1 = jnp.where(iny1_[:, None], row1, 0.0)
        rows = row0 * (1 - fy_)[:, None] + row1 * fy_[:, None]  # (H, S)
        c0 = rows[:, x0_] * jnp.where(inx0_, 1.0, 0.0)[None, :]
        c1 = rows[:, x1_] * jnp.where(inx1_, 1.0, 0.0)[None, :]
        return c0 * (1 - fx_)[None, :] + c1 * fx_[None, :]  # (H, W)

    out = jax.vmap(per_mask)(
        masks.astype(jnp.float32), x0, x1i, fx, inx0, inx1, y0, y1i, fy,
        iny0, iny1,
    )
    # zero strictly outside the box (torchvision pastes only into the box rect)
    xs_b = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    ys_b = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    inside = (
        (xs_b >= jnp.floor(x1)[:, None, None])
        & (xs_b <= jnp.ceil(x2)[:, None, None])
        & (ys_b >= jnp.floor(y1)[:, None, None])
        & (ys_b <= jnp.ceil(y2)[:, None, None])
    )
    return jnp.where(inside, out, 0.0)
