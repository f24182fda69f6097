"""Static-shape non-maximum suppression.

Replaces torchvision's C++/CUDA ``nms`` used inside every reference R-CNN's RPN and
box-head post-processing (``/root/reference/models/detection/rcnn.py:17-19``,
``configs/mask/mask_rcnn_config.py:68``; SURVEY.md §2.10).

TPU design: no dynamic shapes. Instead of returning a variable-length keep list, we
return a fixed-size ``(max_output,)`` index vector plus a validity mask. Suppression is
the *exact* greedy algorithm (identical keep-set to torchvision for distinct scores):
sort once, then a ``lax.fori_loop`` sweep where step ``i`` suppresses every
lower-scored box overlapping a *kept* box ``i`` — each step is one fused (N,) vector
op, so the whole thing is a single compiled scan with an O(N²) IoU matrix computed
once on the MXU-friendly path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou

_NEG_INF = -1e10


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
    valid: jnp.ndarray | None = None,
    score_threshold: float | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over ``(N, 4)`` xyxy boxes.

    Args:
      boxes: ``(N, 4)`` xyxy.
      scores: ``(N,)``.
      iou_threshold: suppress overlap strictly greater than this (torchvision uses
        ``iou > thr``).
      max_output: static number of outputs.
      valid: optional ``(N,)`` bool mask; invalid entries never selected.
      score_threshold: optionally pre-drop boxes with score below this.

    Returns:
      ``(indices, keep_valid)``: ``(max_output,)`` int32 indices into the input arrays
      in descending-score order, and a ``(max_output,)`` bool mask of real outputs.
      Padding slots index 0.
    """
    n = boxes.shape[0]
    scores = scores.astype(jnp.float32)
    if valid is not None:
        scores = jnp.where(valid, scores, _NEG_INF)
    if score_threshold is not None:
        scores = jnp.where(scores > score_threshold, scores, _NEG_INF)

    order = jnp.argsort(-scores)  # descending; stable for ties (lowest index first)
    sboxes = boxes[order]
    sscores = scores[order]
    alive0 = sscores > _NEG_INF / 2  # invalid entries start dead

    iou = pairwise_iou(sboxes, sboxes)
    suppress_mat = iou > iou_threshold  # (N, N) in sorted order

    def body(i, alive):
        # If box i survived, kill all later boxes it overlaps. If it did not survive,
        # nothing changes. Self-overlap is masked by the j > i condition.
        row = suppress_mat[i]
        later = jnp.arange(n) > i
        return alive & ~(row & later & alive[i])

    alive = jax.lax.fori_loop(0, n, body, alive0)

    # Top max_output surviving entries, preserving score order.
    rank = jnp.cumsum(alive.astype(jnp.int32)) - 1  # output slot of each kept box
    slot = jnp.where(alive & (rank < max_output), rank, max_output)
    out_idx = jnp.zeros((max_output + 1,), jnp.int32).at[slot].set(
        order.astype(jnp.int32), mode="drop"
    )
    out_valid = jnp.zeros((max_output + 1,), jnp.bool_).at[slot].set(
        True, mode="drop"
    )
    return out_idx[:max_output], out_valid[:max_output]


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
    valid: jnp.ndarray | None = None,
    score_threshold: float | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS via the torchvision coordinate-offset trick.

    Boxes of different ``idxs`` (class or image ids) are shifted far apart so they can
    never suppress each other, then one plain :func:`nms` runs over everything.
    """
    max_coord = jnp.max(boxes) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms(shifted, scores, iou_threshold, max_output, valid, score_threshold)
