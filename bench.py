"""Benchmark: aligned crops/sec/chip for the full detect→align→embed pipeline.

This is the BASELINE.json headline metric (≥5000 crops/sec/chip on v5e): per image,
run the Keypoint R-CNN head+landmark detector (ResNet-50 FPN, the production model
of ``configs/keypoint/keypoints_config.py``), take the top detection's landmarks,
homography-align to the canonical 224×224 head crop
(``preprocessor/align.py`` semantics), normalize, and embed with the production
ResNet-50 feature extractor — all as ONE jitted graph on device.

Weights are randomly initialized (throughput is weight-independent); compute runs
in bfloat16 on the MXU with float32 params. Prints exactly one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_pipeline(batch_size: int, image_size: int, bf16: bool = True):
    import jax
    import jax.numpy as jnp

    from pets_face_recognition_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from pets_face_recognition_tpu.models import resnet50_embedder
    from pets_face_recognition_tpu.models.fpn import BackboneWithFPN
    from pets_face_recognition_tpu.models.rcnn import GeneralizedRCNN, RCNNConfig
    from pets_face_recognition_tpu.models.resnet import resnet50
    from pets_face_recognition_tpu.ops.homography import align_crop

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    det_cfg = RCNNConfig(
        num_classes=2,
        num_keypoints=3,
        box_detections_per_img=1,
        # production inference budgets: one pet head per image — 256/64
        # proposals lose nothing on single-object images and keep the NMS loop
        # and the box-head RoI work small
        rpn_pre_nms_top_n_test=256,
        rpn_post_nms_top_n_test=64,
    )
    detector = GeneralizedRCNN(
        backbone=BackboneWithFPN(
            backbone=resnet50(features_only=True, frozen_stats=True, dtype=dtype)
        ),
        cfg=det_cfg,
    )
    embedder = resnet50_embedder(embedding_dim=512, dtype=dtype)
    base_pts = jnp.asarray([[70.0, 92.0], [154.0, 92.0], [112.0, 160.0]])

    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(
        np.random.RandomState(0).rand(batch_size, image_size, image_size, 3),
        jnp.float32,
    )
    det_vars = jax.jit(lambda r, x: detector.init(r, x, train=False))(rng, images)
    emb_vars = jax.jit(embedder.init)(
        rng, jnp.zeros((batch_size, 224, 224, 3), jnp.float32)
    )

    # two jits: detector | align+embed — the single fused module serializes past
    # the remote compiler's request-size limit; the seam costs one dispatch and
    # keeps everything on device
    @jax.jit
    def detect(imgs):
        dets = detector.apply(det_vars, imgs, train=False)
        return dets["keypoints"][:, 0, :, :2]  # (B, 3, 2) top detection

    @jax.jit
    def align_embed(imgs, kps):
        crops = align_crop(imgs, kps, base_pts, (224, 224))
        return embedder.apply(emb_vars, crops, train=False)

    def pipeline(imgs):
        return align_embed(imgs, detect(imgs))

    return pipeline, images


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--image-size", type=int, default=320)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--no-bf16", action="store_true")
    args = parser.parse_args()

    import jax

    pipeline, images = build_pipeline(args.batch_size, args.image_size,
                                      bf16=not args.no_bf16)
    # compile + warmup
    out = pipeline(images)
    jax.block_until_ready(out)
    for _ in range(args.warmup):
        jax.block_until_ready(pipeline(images))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = pipeline(images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    crops_per_sec = args.batch_size * args.iters / dt
    baseline = 5000.0
    print(json.dumps({
        "metric": "aligned_crops_per_sec_per_chip",
        "value": round(crops_per_sec, 2),
        "unit": "crops/s",
        "vs_baseline": round(crops_per_sec / baseline, 4),
    }))


if __name__ == "__main__":
    main()
