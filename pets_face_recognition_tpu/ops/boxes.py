"""Box math: IoU, clip, encode/decode.

Replaces torchvision's ``BoxCoder`` / ``box_iou`` used implicitly by every R-CNN in the
reference (``/root/reference/models/detection/rcnn.py``; SURVEY.md §2.10). Conventions
match torchvision so converted checkpoints predict identical boxes:

- boxes are ``(x1, y1, x2, y2)`` in pixel coordinates, ``x2 > x1``;
- encode: ``t = (Δcenter/size, log(size_gt/size_anchor)) * weights``;
- decode clamps ``dw/dh`` at ``log(1000/16)`` before ``exp`` (torchvision's
  ``BBOX_XFORM_CLIP``) to keep early-training boxes finite.

Everything is vectorized and static-shape; invalid/padding boxes are handled by the
callers' validity masks, never by dynamic filtering.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# torchvision BoxCoder's bbox_xform_clip = log(1000/16).
_BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Areas of ``(..., 4)`` xyxy boxes."""
    return jnp.clip(boxes[..., 2] - boxes[..., 0], 0) * jnp.clip(
        boxes[..., 3] - boxes[..., 1], 0
    )


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix of shape ``(N, M)`` for xyxy boxes ``(N, 4)`` and ``(M, 4)``."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(boxes1)[:, None] + area(boxes2)[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


# Alias matching the reference's static method name
# (`engine/detector_controller.py:205-218`).
box_iou = pairwise_iou


def clip_boxes(boxes: jnp.ndarray, image_size: tuple[int, int]) -> jnp.ndarray:
    """Clip xyxy boxes to ``image_size = (height, width)``."""
    h, w = image_size
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def _xyxy_to_cxcywh(boxes: jnp.ndarray):
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return cx, cy, w, h


def encode_boxes(
    reference_boxes: jnp.ndarray,
    anchors: jnp.ndarray,
    weights: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Encode ground-truth boxes relative to anchors (torchvision BoxCoder.encode)."""
    wx, wy, ww, wh = weights
    gcx, gcy, gw, gh = _xyxy_to_cxcywh(reference_boxes)
    acx, acy, aw, ah = _xyxy_to_cxcywh(anchors)
    aw = jnp.maximum(aw, 1e-6)
    ah = jnp.maximum(ah, 1e-6)
    tx = wx * (gcx - acx) / aw
    ty = wy * (gcy - acy) / ah
    tw = ww * jnp.log(jnp.maximum(gw, 1e-6) / aw)
    th = wh * jnp.log(jnp.maximum(gh, 1e-6) / ah)
    return jnp.stack([tx, ty, tw, th], axis=-1)


def decode_boxes(
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    weights: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Decode regression deltas against anchors into xyxy boxes.

    ``deltas``: ``(..., 4)``; ``anchors``: broadcast-compatible ``(..., 4)`` xyxy.
    """
    wx, wy, ww, wh = weights
    acx, acy, aw, ah = _xyxy_to_cxcywh(anchors)
    tx = deltas[..., 0] / wx
    ty = deltas[..., 1] / wy
    tw = jnp.clip(deltas[..., 2] / ww, max=_BBOX_XFORM_CLIP)
    th = jnp.clip(deltas[..., 3] / wh, max=_BBOX_XFORM_CLIP)
    cx = tx * aw + acx
    cy = ty * ah + acy
    w = jnp.exp(tw) * aw
    h = jnp.exp(th) * ah
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )
