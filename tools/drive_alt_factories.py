"""Drive the alternate R-CNN factories on the REAL TPU chip (VERDICT r3 #6).

The four non-production factories (reference ``models/detection/rcnn.py``:
``mobile_net_v3_large_rcnn`` :13-43, ``convnetx_tiny_rcnn`` :46-75,
``convnext_tiny_keypoint_rcnn`` :78-101, ``swin_tiny_keypoint_rcnn``
:129-164) were CPU-tested only; Mosaic/remote-compile has burned this repo
before on graphs that were fine on CPU. This script compiles + runs each
factory's EVAL forward and ONE train step on the chip with small-but-real
shapes, and prints per-factory wall times.

One process holds the chip for all factories (exclusive-chip rule). Budget
the first run generously: 8 fresh remote compiles (CLAUDE.md: 30-300 s each).

Usage: timeout 3000 python tools/drive_alt_factories.py [--size 256]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def drive(name: str, build, size: int, with_kp: bool, with_mask: bool = False):
    import jax
    import jax.numpy as jnp

    from pets_face_recognition_tpu.losses import SumDetectionLoss

    rng = np.random.RandomState(0)
    B, G = 2, 2
    model = build()
    loss_mod = SumDetectionLoss(model=model)
    imgs = jnp.asarray(rng.rand(B, size, size, 3), jnp.float32)
    targets = {
        "labels": jnp.ones((B, G), jnp.int32),
        "boxes": jnp.tile(jnp.asarray(
            [[24.0, 24.0, 120.0, 120.0], [60.0, 60.0, 180.0, 180.0]]),
            (B, 1, 1)),
        "valid": jnp.ones((B, G), bool),
    }
    if with_mask:
        targets["masks"] = jnp.asarray(rng.rand(B, G, size, size) > 0.5,
                                       jnp.float32)
    if with_kp:
        kp = np.zeros((B, G, 3, 3), np.float32)
        kp[..., 0] = rng.uniform(40, 160, (B, G, 3))
        kp[..., 1] = rng.uniform(40, 160, (B, G, 3))
        kp[..., 2] = 1.0
        targets["keypoints"] = jnp.asarray(kp)

    out = {"factory": name, "size": size}

    t0 = time.perf_counter()
    variables = loss_mod.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        imgs[:1], jax.tree_util.tree_map(lambda t: t[:1], targets),
        train=True)
    out["init_s"] = round(time.perf_counter() - t0, 1)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    # eval forward (the serving graph: proposals -> NMS -> heads -> decode)
    eval_fn = jax.jit(lambda p, s, x: model.apply(
        {"params": p["model"], "batch_stats": s.get("model", s)},
        x, train=False))
    t0 = time.perf_counter()
    dets = eval_fn(params, stats, imgs)
    jax.block_until_ready(dets)
    out["eval_compile_s"] = round(time.perf_counter() - t0, 1)
    boxes = np.asarray(dets["boxes"])
    assert np.isfinite(boxes[np.asarray(dets["valid"])]).all() \
        if np.asarray(dets["valid"]).any() else True
    out["eval_dets"] = int(np.asarray(dets["valid"]).sum())

    # one train step
    def step(p, x, t):
        def loss_fn(pp):
            o = loss_mod.apply(
                {"params": pp, "batch_stats": stats}, x, t, train=True,
                rngs={"sampler": jax.random.PRNGKey(7)})
            return o["loss"]
        return jax.value_and_grad(loss_fn)(p)

    train_fn = jax.jit(step)
    t0 = time.perf_counter()
    loss, grads = train_fn(params, imgs, targets)
    jax.block_until_ready(loss)
    out["train_compile_s"] = round(time.perf_counter() - t0, 1)
    out["train_loss"] = round(float(loss), 4)
    gnorm = float(jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.sum(jnp.abs(l))), grads, 0.0))
    assert np.isfinite(float(loss)), f"{name}: non-finite loss"
    assert np.isfinite(gnorm) and gnorm > 0, f"{name}: bad grads {gnorm}"

    # steady-state eval timing (3 runs, chained host pulls per PERF.md timing
    # rules — a fresh input each call so the tunnel cannot serve a cache)
    times = []
    for i in range(3):
        x = jnp.asarray(rng.rand(B, size, size, 3), jnp.float32)
        t0 = time.perf_counter()
        d = eval_fn(params, stats, x)
        np.asarray(d["scores"]).sum()
        times.append(time.perf_counter() - t0)
    out["eval_ms"] = round(min(times) * 1e3, 1)
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    from pets_face_recognition_tpu.models.rcnn import (
        convnetx_tiny_rcnn,
        convnext_tiny_keypoint_rcnn,
        mobile_net_v3_large_rcnn,
        swin_tiny_keypoint_rcnn,
    )

    small = dict(rpn_pre_nms_top_n_train=256, rpn_post_nms_top_n_train=128,
                 rpn_pre_nms_top_n_test=128, rpn_post_nms_top_n_test=64,
                 rpn_batch_size_per_image=64, box_batch_size_per_image=64)
    factories = {
        "mobile_net_v3_large_rcnn":
            (lambda: mobile_net_v3_large_rcnn(**small), False),
        "convnetx_tiny_rcnn":
            (lambda: convnetx_tiny_rcnn(**small), False),
        "convnext_tiny_keypoint_rcnn":
            (lambda: convnext_tiny_keypoint_rcnn(**small), True),
        "swin_tiny_keypoint_rcnn":
            (lambda: swin_tiny_keypoint_rcnn(**small), True),
    }
    results = []
    for name, (build, with_kp) in factories.items():
        if args.only and name not in args.only:
            continue
        size = 224 if "swin" in name else args.size  # Swin-T window tiling
        results.append(drive(name, build, size, with_kp))
    print(json.dumps({"driven": [r["factory"] for r in results]}))


if __name__ == "__main__":
    main()
