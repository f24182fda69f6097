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

import numpy as np
import jax
import jax.numpy as jnp


def _interp_coords_torch(out_size: int, in_size: int):
    """torch ``F.interpolate(mode='bilinear', align_corners=False)`` source
    coordinates for one axis: ``src = max(scale*(i+0.5)-0.5, 0)``; tap 0 is
    ``floor(src)``, tap 1 is ``min(tap0+1, in_size-1)`` (edge replicate)."""
    scale = in_size / out_size
    src = np.maximum(
        scale * (np.arange(out_size, dtype=np.float32) + 0.5) - 0.5, 0.0)
    i0 = np.minimum(src.astype(np.int64), in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    lam = src - i0
    return i0, i1, lam


def paste_mask_np(mask: np.ndarray, box: np.ndarray, im_h: int, im_w: int,
                  padding: int = 1) -> np.ndarray:
    """Host (numpy) paste of ONE ``(S, S)`` mask into ``(im_h, im_w)`` with
    torchvision's exact ``paste_masks_in_image`` semantics: pad the mask by 1,
    scale the box by ``(S+2)/S`` (``expand_masks``/``expand_boxes``), truncate
    the box to int64, bilinear-resize (align_corners=False, torch edge
    clamping) to ``(y2-y1+1, x2-x1+1)``, paste clipped to the image.

    This is the mask the reference thresholds and crops with in ``Preproc4``
    (ref ``preprocessor/__init__.py:236-243``) — the compat pipelines use it so
    masked crops and tightened boxes are bit-comparable to a torch oracle.
    The jitted :func:`paste_masks` is the static-shape device analog.
    """
    S = mask.shape[0]
    m = np.zeros((S + 2 * padding, S + 2 * padding), np.float32)
    m[padding:S + padding, padding:S + padding] = mask
    scale = (S + 2.0 * padding) / S
    cx, cy = (box[2] + box[0]) * 0.5, (box[3] + box[1]) * 0.5
    w2, h2 = (box[2] - box[0]) * 0.5 * scale, (box[3] - box[1]) * 0.5 * scale
    b = np.array([cx - w2, cy - h2, cx + w2, cy + h2], np.float64).astype(
        np.int64)  # torch Tensor.to(int64) truncates toward zero
    w = max(int(b[2] - b[0] + 1), 1)
    h = max(int(b[3] - b[1] + 1), 1)
    Sp = S + 2 * padding
    x0, x1, lx = _interp_coords_torch(w, Sp)
    y0, y1, ly = _interp_coords_torch(h, Sp)
    rows = m[y0] * (1.0 - ly)[:, None] + m[y1] * ly[:, None]     # (h, Sp)
    resized = (rows[:, x0] * (1.0 - lx)[None, :]
               + rows[:, x1] * lx[None, :])                      # (h, w)
    out = np.zeros((im_h, im_w), np.float32)
    x_0, x_1 = max(int(b[0]), 0), min(int(b[2]) + 1, im_w)
    y_0, y_1 = max(int(b[1]), 0), min(int(b[3]) + 1, im_h)
    if x_1 > x_0 and y_1 > y_0:
        out[y_0:y_1, x_0:x_1] = resized[
            y_0 - int(b[1]):y_1 - int(b[1]), x_0 - int(b[0]):x_1 - int(b[0])
        ]
    return out


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
