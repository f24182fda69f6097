"""Training-step throughput benchmark on the real chip.

Times one optimizer step for the three production training recipes
(SURVEY.md §3.1/§3.2) with synthetic batches:

- ``fe``:   ResNet-50 + ArcFace margin + focal loss (``configs/cat_fe``),
            SGD, B=64 @224² aligned crops;
- ``kp``:   Keypoint R-CNN ResNet-50-FPN (``configs/keypoint``), B=4 @320²;
- ``mask``: Mask R-CNN ResNet-50-FPN (``configs/mask``), B=4 @320².

Prints one JSON line per model with ms/step and examples/s. Like ``bench.py``
it uses async-loop timing (see PERF.md "Timing on the axon backend").

Usage: python tools/bench_train.py [--models fe,kp,mask] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _force(tree):
    """Materialize on host — the axon tunnel's ``block_until_ready`` does not
    reliably force execution (PERF.md "Timing on the axon backend")."""
    import jax

    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(np.asarray(leaf).ravel()[0])


def bench_style(step, state, batch, rng, iters):
    s = step(state, batch, rng)
    _force(s)
    t0 = time.perf_counter()
    s = state
    for _ in range(iters):
        s = step(s, batch, rng)  # chained: state feeds the next step
    _force(s)  # one host pull materializes the whole chain
    return (time.perf_counter() - t0) / iters * 1000


def bench_fe(iters):
    import jax
    import jax.numpy as jnp
    import optax

    from pets_face_recognition_tpu.losses import SoftmaxBasedMetricLearning
    from pets_face_recognition_tpu.models import resnet50_embedder

    B, n_classes = 64, 500
    model = SoftmaxBasedMetricLearning(
        model=resnet50_embedder(embedding_dim=512, dtype=jnp.bfloat16),
        emb_size=512, num_classes=n_classes,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(B, 224, 224, 3), jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randint(0, n_classes, B))
    variables = jax.jit(lambda r: model.init(r, x, y, train=True))(rng)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.sgd(1e-2, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step(state, batch, r):
        params, batch_stats, opt_state = state

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["x"], batch["y"], train=True,
                mutable=["batch_stats"],
            )
            return out["loss"], mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_bs, new_opt)

    ms = bench_style(step, (params, batch_stats, opt_state),
                     {"x": x, "y": y}, rng, iters)
    return {"model": "fe_resnet50_arcface", "batch": B, "ms_per_step":
            round(ms, 2), "examples_per_sec": round(B / ms * 1000, 1)}


def bench_rcnn(kind, iters):
    import jax
    import jax.numpy as jnp
    import optax

    from pets_face_recognition_tpu.models.rcnn import (
        keypointrcnn_resnet50_fpn,
        maskrcnn_resnet50_fpn,
    )

    B, S, G = 4, 320, 4
    # factory defaults (the production training recipes) with bfloat16 compute
    # plumbed through backbone, FPN, and heads (params/stats stay float32)
    if kind == "kp":
        model = keypointrcnn_resnet50_fpn()
    else:
        model = maskrcnn_resnet50_fpn()
    inner = model.backbone.backbone.clone(dtype=jnp.bfloat16)
    fpn = model.backbone.clone(dtype=jnp.bfloat16, backbone=inner)
    model = model.clone(dtype=jnp.bfloat16, backbone=fpn)
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(B, S, S, 3), jnp.float32)
    x1 = rs.uniform(10, 150, (B, G)); y1 = rs.uniform(10, 150, (B, G))
    boxes = np.stack([x1, y1, x1 + rs.uniform(40, 120, (B, G)),
                      y1 + rs.uniform(40, 120, (B, G))], -1)
    targets = {
        "boxes": jnp.asarray(boxes, jnp.float32),
        "labels": jnp.ones((B, G), jnp.int32),
        "valid": jnp.ones((B, G), bool),
    }
    if kind == "kp":
        kps = boxes[:, :, None, :2] + rs.uniform(5, 35, (B, G, 3, 2))
        targets["keypoints"] = jnp.asarray(
            np.concatenate([kps, np.ones((B, G, 3, 1))], -1), jnp.float32)
    else:
        targets["masks"] = jnp.asarray(rs.rand(B, G, S, S) > 0.5)

    variables = jax.jit(lambda r: model.init(
        {"params": r, "sampler": r}, images, targets, train=True))(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.sgd(1e-3, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step(state, batch, r):
        params, batch_stats, opt_state = state

        def loss_fn(p):
            var = {"params": p}
            if batch_stats:
                var["batch_stats"] = batch_stats
            losses = model.apply(var, batch["images"], batch["targets"],
                                 train=True, rngs={"sampler": r})
            return sum(losses.values())

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), batch_stats, new_opt)

    ms = bench_style(step, (params, batch_stats, opt_state),
                     {"images": images, "targets": targets}, rng, iters)
    name = ("keypointrcnn_resnet50_fpn" if kind == "kp"
            else "maskrcnn_resnet50_fpn")
    return {"model": name, "batch": B, "ms_per_step": round(ms, 2),
            "examples_per_sec": round(B / ms * 1000, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="fe,kp,mask")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from pets_face_recognition_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    for m in args.models.split(","):
        m = m.strip()
        if m == "fe":
            print(json.dumps(bench_fe(args.iters)), flush=True)
        elif m in ("kp", "mask"):
            print(json.dumps(bench_rcnn(m, args.iters)), flush=True)
        else:
            raise SystemExit(f"unknown model {m}")


if __name__ == "__main__":
    main()
