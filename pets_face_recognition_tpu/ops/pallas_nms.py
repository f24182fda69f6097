"""Pallas TPU kernel: greedy NMS over score-sorted boxes.

The pure-JAX NMS (``ops/nms.py``) materializes a (K, K) IoU matrix in HBM and
dynamic-slices one row per ``fori_loop`` step — K HBM round-trips. This kernel
keeps the entire working set in VMEM: boxes live as four (1, K) lanes, the alive
mask is a (1, K) VMEM scratch, and each of the K sequential steps computes its IoU
row on the fly with pure VPU ops. Memory is O(K), not O(K²).

Exact greedy semantics (same keep-set as torchvision for distinct scores): input
boxes MUST already be sorted by score descending; invalid entries carry
``valid = 0`` and never suppress nor survive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, keep_ref, alive, *, iou_threshold: float):
    """boxes (..., 4, K) VMEM [x1;y1;x2;y2 rows], valid (..., 1, K),
    keep out (..., 1, K) — leading block dims (from grid blocking) squeezed."""
    k = boxes_ref.shape[-1]
    boxes = boxes_ref[...].reshape(4, k)
    # all vectors kept 2-D (1, k): Mosaic's layout inference rejects 1-D loop
    # carries (layout_rank check)
    x1 = boxes[0:1, :]
    y1 = boxes[1:2, :]
    x2 = boxes[2:3, :]
    y2 = boxes[3:4, :]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    P = 8  # pivots per loop step: same vector-op count, 8x fewer iterations

    def block(blk, alive_v):
        # Mosaic has no dynamic scalar extraction inside loops — pivots are
        # selected via mask-reductions (pure VPU over k lanes). The within-block
        # chain stays sequential (a pivot can be suppressed by an earlier pivot
        # of the same block), but it is statically unrolled.
        i0 = blk * P
        for d in range(P):
            i = i0 + d
            sel = (col == i).astype(jnp.float32)
            ai = jnp.sum(alive_v * sel)
            bx1 = jnp.sum(x1 * sel)
            by1 = jnp.sum(y1 * sel)
            bx2 = jnp.sum(x2 * sel)
            by2 = jnp.sum(y2 * sel)
            barea = jnp.sum(area * sel)

            ix1 = jnp.maximum(x1, bx1)
            iy1 = jnp.maximum(y1, by1)
            ix2 = jnp.minimum(x2, bx2)
            iy2 = jnp.minimum(y2, by2)
            inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
            union = area + barea - inter
            iou = jnp.where(union > 0.0, inter / union, 0.0)

            suppress = (iou > iou_threshold) & (col > i) & (ai > 0.0)
            alive_v = jnp.where(suppress, 0.0, alive_v)
        return alive_v

    alive0 = valid_ref[...].reshape(1, k)
    alive_final = jax.lax.fori_loop(0, (k + P - 1) // P, block, alive0)
    alive[...] = alive_final
    keep_ref[...] = alive_final.reshape(keep_ref.shape)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_keep_sorted(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Keep mask for score-DESC-sorted ``boxes (K, 4)`` with ``valid (K,)``.

    Returns a float32 ``(K,)`` mask (1.0 = kept).
    """
    k = boxes.shape[0]
    boxes_t = boxes.astype(jnp.float32).T  # (4, K): lanes along K
    valid_f = valid.astype(jnp.float32)[None, :]
    kernel = functools.partial(_nms_kernel, iou_threshold=iou_threshold)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, k), jnp.float32)],
        interpret=interpret,
    )(boxes_t, valid_f)
    return out[0]


def _nms_batch_kernel(boxes_ref, valid_ref, keep_ref, *, iou_threshold: float):
    """Fully batched kernel: ``boxes (G, 4, K)``, ``valid (G, K)`` →
    keep ``(G, K)``.

    All G groups advance in lock-step through the K sequential greedy steps —
    the per-step work is (G, K)-shaped VPU ops (groups in sublanes, boxes in
    lanes), so the sequential depth is K, not G·K as with one program per group
    (measured ~8x faster at G=80, K=400).
    """
    g, _, k = boxes_ref.shape
    boxes = boxes_ref[...]
    x1 = boxes[:, 0, :]
    y1 = boxes[:, 1, :]
    x2 = boxes[:, 2, :]
    y2 = boxes[:, 3, :]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, k), 1)

    def step(i, alive_v):
        sel = (col == i).astype(jnp.float32)  # same pivot column per group
        ai = jnp.sum(alive_v * sel, axis=1, keepdims=True)      # (G, 1)
        bx1 = jnp.sum(x1 * sel, axis=1, keepdims=True)
        by1 = jnp.sum(y1 * sel, axis=1, keepdims=True)
        bx2 = jnp.sum(x2 * sel, axis=1, keepdims=True)
        by2 = jnp.sum(y2 * sel, axis=1, keepdims=True)
        barea = jnp.sum(area * sel, axis=1, keepdims=True)

        ix1 = jnp.maximum(x1, bx1)
        iy1 = jnp.maximum(y1, by1)
        ix2 = jnp.minimum(x2, bx2)
        iy2 = jnp.minimum(y2, by2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        union = area + barea - inter
        iou = jnp.where(union > 0.0, inter / union, 0.0)

        suppress = (iou > iou_threshold) & (col > i) & (ai > 0.0)
        return jnp.where(suppress, 0.0, alive_v)

    alive = jax.lax.fori_loop(0, k, step, valid_ref[...])
    keep_ref[...] = alive


# groups per program: bounds the VMEM working set (the fori_loop keeps ~10
# (Gc, K) f32 live values; Gc=256/K=128 ≈ 6 MB, well under the 16 MB scoped
# limit that a single program hits at G≈700). Per-step VPU work scales with
# the group count either way, so chunking costs only program overhead.
NMS_GROUP_BLOCK = 256


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_keep_sorted_batch(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched NMS over ``boxes (G, K, 4)`` / ``valid (G, K)`` → ``(G, K)`` keep.

    Groups ride the sublane dimension; group chunks of ``NMS_GROUP_BLOCK``
    ride the pallas grid.
    """
    g, k, _ = boxes.shape
    gc = min(g, NMS_GROUP_BLOCK)
    pad = (-g) % gc
    boxes_t = jnp.transpose(boxes.astype(jnp.float32), (0, 2, 1))  # (G, 4, K)
    valid_f = valid.astype(jnp.float32)
    if pad:
        boxes_t = jnp.pad(boxes_t, ((0, pad), (0, 0), (0, 0)))
        valid_f = jnp.pad(valid_f, ((0, pad), (0, 0)))
    kernel = functools.partial(_nms_batch_kernel, iou_threshold=iou_threshold)
    out = pl.pallas_call(
        kernel,
        grid=((g + pad) // gc,),
        out_shape=jax.ShapeDtypeStruct((g + pad, k), jnp.float32),
        in_specs=[
            pl.BlockSpec((gc, 4, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gc, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gc, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes_t, valid_f)
    return out[:g]


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_keep_sorted_grid(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Grid variant: ``boxes (G, K, 4)`` (each row score-DESC-sorted),
    ``valid (G, K)`` → keep masks ``(G, K)``. One program per group — the whole
    batch × FPN-level NMS workload runs as one pallas_call.
    """
    g, k, _ = boxes.shape
    boxes_t = jnp.transpose(boxes.astype(jnp.float32), (0, 2, 1))  # (G, 4, K)
    valid_f = valid.astype(jnp.float32)[:, None, :]  # (G, 1, K)
    kernel = functools.partial(_nms_kernel, iou_threshold=iou_threshold)
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        out_shape=jax.ShapeDtypeStruct((g, 1, k), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, k), jnp.float32)],
        interpret=interpret,
    )(boxes_t, valid_f)
    return out[:, 0, :]
