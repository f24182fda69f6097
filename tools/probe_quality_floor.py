"""Per-stage floor probe of the resnet50 quality pipeline (VERDICT r4 #3).

Times the detect-split stages of the int8_full quality config ISOLATED on
the chip — producer (int8 trunk+FPN+RPN head), consumer (proposals + RoI
stages + kp decode), align+embed — plus the bare int8 backbone+FPN, at the
bench shapes (B=128 @320). The pipeline's throughput bound is the serial
sum (single chip, one compute stream); comparing the end-to-end bench
number against that sum says how much overhead remains vs physics.

Usage: timeout 2400 python tools/probe_quality_floor.py [--iters 30]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def timed(fn, args, iters):
    """Time ``fn(*args, scale)`` where fn is a jit returning ONE scalar that
    depends on every output (axon traps: pulling a big buffer through the
    tunnel costs seconds; an unconsumed output may never execute — so
    reduce in-graph, chain a scale so iterations can't be deduped, and pull
    only the final scalar)."""
    out = fn(*args, 1.0)
    float(np.asarray(out))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args, 1.0 + 1e-9 * i)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_pipeline, build_serving_models
    from pets_face_recognition_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    B, S = args.batch_size, 320

    # the int8_full + detect-split quality config (sweep round-5 winner)
    detector, embedder, base_pts, dtype = build_serving_models(
        detector_kind="resnet50", rpn_pre=24, rpn_post=8,
        detector_quant="int8", embedder_quant="int8",
        quant_fpn=True, quant_rpn=True, kp_head_quant="int8")
    det_init, emb_init, _, _ = build_serving_models(
        detector_kind="resnet50", rpn_pre=24, rpn_post=8,
        detector_quant="calibrate", embedder_quant="calibrate",
        quant_fpn=True, quant_rpn=True, kp_head_quant="calibrate")
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(np.random.RandomState(0).rand(B, S, S, 3),
                         jnp.float32)
    det_vars = jax.jit(lambda r, x: det_init.init(r, x, train=False))(
        rng, images)
    images = images.astype(jnp.bfloat16)
    crops224 = jnp.asarray(np.random.RandomState(1).rand(B, 224, 224, 3),
                           jnp.float32)
    emb_vars = jax.jit(emb_init.init)(rng, crops224)

    def reduce_tree(t):
        return sum(jnp.mean(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(t))

    producer_full = jax.jit(
        lambda x: detector.apply(det_vars, x, method="backbone_rpn"))

    producer = jax.jit(
        lambda x, s: reduce_tree(detector.apply(
            det_vars, x * s, method="backbone_rpn")))
    consumer = jax.jit(
        lambda f, o, d, s: reduce_tree(detector.apply(
            det_vars, jax.tree_util.tree_map(lambda x: x * s, f), o, d,
            (S, S), method="roi_eval")["keypoints"][:, 0, :, :2]))
    embed = jax.jit(
        lambda c, s: reduce_tree(embedder.apply(
            emb_vars, (c * s).astype(jnp.bfloat16), train=False)))

    from pets_face_recognition_tpu.ops.homography import solve_homography
    from pets_face_recognition_tpu.ops.pallas_warp import (
        warp_affine_batch_pallas,
    )

    @jax.jit
    def align(imgs, kps, s):
        base = jnp.broadcast_to(base_pts, (imgs.shape[0], 3, 2))
        kps = jnp.round(kps * s)
        src4 = jnp.concatenate([jnp.round(kps.mean(1, keepdims=True)), kps],
                               axis=1)
        dst4 = jnp.concatenate([jnp.round(base.mean(1, keepdims=True)),
                                base], axis=1)
        Hs = solve_homography(src4, dst4)
        crops = warp_affine_batch_pallas(imgs, Hs, (224, 224),
                                         compute_dtype=jnp.int8, band=80,
                                         out_dtype=jnp.bfloat16)
        return jnp.mean(crops.astype(jnp.float32))

    kps = jnp.asarray(
        np.random.RandomState(2).uniform(80, 240, (B, 3, 2)), jnp.float32)

    res = {}
    res["producer_trunk_fpn_rpnhead_ms"] = round(
        timed(producer, (images,), args.iters), 2)
    feats, obj, deltas = producer_full(images)
    res["consumer_roi_kp_ms"] = round(
        timed(consumer, (feats, obj, deltas), args.iters), 2)
    res["align_warp_ms"] = round(timed(align, (images, kps), args.iters), 2)
    res["embed224_ms"] = round(timed(embed, (crops224,), args.iters), 2)

    serial = (res["producer_trunk_fpn_rpnhead_ms"]
              + res["consumer_roi_kp_ms"] + res["align_warp_ms"]
              + res["embed224_ms"])
    res["serial_sum_ms"] = round(serial, 2)
    res["serial_bound_crops_per_s"] = round(B / serial * 1e3, 1)
    res["batch"] = B
    print(json.dumps(res))


if __name__ == "__main__":
    main()
