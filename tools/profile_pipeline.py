"""Stage-level profiler for the serving pipeline (bench.py configuration).

Times cumulative prefixes of the detector's eval path plus the align and embed
stages on the real chip, and prints a per-stage table. Differences between
successive cumulative rows are the stage costs.

MEASUREMENT CAVEAT (see PERF.md "Timing on the axon backend"): per-iteration
``block_until_ready`` probes carry a constant per-run sync overhead (~25 ms on
this image's tunnel), so only the DELTAS between rows are meaningful; the
constant cancels. The end-to-end row should be cross-checked against
``python bench.py`` (the driver's metric), which uses async-loop timing.

Usage:
    python tools/profile_pipeline.py [--batch-size 128] [--detector mobile]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--image-size", type=int, default=320)
    ap.add_argument("--rpn-pre", type=int, default=128)
    ap.add_argument("--rpn-post", type=int, default=16)
    ap.add_argument("--band", type=int, default=96)
    ap.add_argument("--detector", choices=("mobile", "resnet50"),
                    default="mobile")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pets_face_recognition_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from bench import build_serving_models
    from pets_face_recognition_tpu.models import roi_heads as rh
    from pets_face_recognition_tpu.models.rpn import generate_proposals
    from pets_face_recognition_tpu.ops.homography import solve_homography
    from pets_face_recognition_tpu.ops.pallas_warp import warp_affine_batch_pallas

    B, S = args.batch_size, args.image_size
    # exactly the benchmarked models — single construction site in bench.py
    detector, embedder, base_pts_b, _ = build_serving_models(
        detector_kind=args.detector, rpn_pre=args.rpn_pre,
        rpn_post=args.rpn_post)

    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(np.random.RandomState(0).rand(B, S, S, 3), jnp.float32)
    det_vars = jax.jit(lambda r, x: detector.init(r, x, train=False))(rng, images)
    emb_vars = jax.jit(embedder.init)(rng, jnp.zeros((B, 224, 224, 3),
                                                     jnp.float32))

    def upto(stage):
        def m(self, imgs):
            c = self.cfg
            image_size = (S, S)
            feats = self.backbone(imgs, train=False)
            if stage == "backbone+fpn":
                return sum(jnp.sum(v.astype(jnp.float32))
                           for v in feats.values())
            anchors, level_ids, strides = self._anchors_and_levels(
                feats, image_size)
            objectness, deltas = self.rpn_head(feats)
            if stage == "+rpn_head":
                return (objectness.astype(jnp.float32).sum()
                        + deltas.astype(jnp.float32).sum())
            pool_names, pool_feats = self._pool_levels(feats)
            proposals, prop_valid = generate_proposals(
                objectness, deltas, anchors, level_ids, image_size,
                c.rpn_pre_nms_top_n_test, c.rpn_post_nms_top_n_test,
                c.rpn_nms_thresh, num_levels=int(level_ids.max()) + 1)
            if stage == "+proposals":
                return proposals.sum()
            Sp = proposals.shape[1]
            boxes_flat = proposals.reshape(B * Sp, 4)
            batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), Sp)
            class_logits, box_deltas = self._box_forward(
                pool_names, pool_feats, boxes_flat, batch_idx, strides)
            if stage == "+box_head":
                return class_logits.sum() + box_deltas.sum()
            det_boxes, det_labels, det_scores, det_valid = (
                rh.postprocess_detections_batch(
                    class_logits.reshape(B, Sp, -1),
                    box_deltas.reshape(B, Sp, -1, 4),
                    proposals, prop_valid, image_size,
                    c.box_score_thresh, c.box_nms_thresh,
                    c.box_detections_per_img))
            if stage == "+postprocess":
                return det_boxes.sum()
            D = det_boxes.shape[1]
            det_flat = det_boxes.reshape(B * D, 4)
            det_bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), D)
            pooled = self._roi_align(pool_names, pool_feats, det_flat,
                                     det_bidx, strides,
                                     (c.keypoint_roi_size, c.keypoint_roi_size))
            kp_logits = self.keypoint_head(pooled)
            kps, _ = rh.heatmaps_to_keypoints(kp_logits, det_flat)
            return kps.reshape(B, D, c.num_keypoints, 3)[:, 0, :, :2].sum()
        return m

    base_pts = base_pts_b
    kps = jnp.tile(base_pts[None], (B, 1, 1)) + 10.0

    def align_only(imgs, kp):
        base = jnp.broadcast_to(base_pts, (imgs.shape[0], 3, 2))
        # production semantics (see bench.py): rounded landmarks + rounded
        # centroids -> slightly projective H through the kernel's divide
        kp = jnp.round(kp)
        src4 = jnp.concatenate([jnp.round(kp.mean(axis=1, keepdims=True)),
                                kp], axis=1)
        dst4 = jnp.concatenate([jnp.round(base.mean(axis=1, keepdims=True)),
                                base], axis=1)
        Hs = solve_homography(src4, dst4)
        crops = warp_affine_batch_pallas(imgs, Hs, (224, 224),
                                         compute_dtype=jnp.bfloat16,
                                         band=args.band)
        return crops.astype(jnp.float32).sum()

    crops = jnp.asarray(np.random.RandomState(1).rand(B, 224, 224, 3),
                        jnp.float32)

    def timeit(f, *a):
        jax.block_until_ready(f(*a))
        jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            jax.block_until_ready(f(*a))
        return (time.perf_counter() - t0) / args.iters * 1000

    print(f"# detector={args.detector} B={B} size={S} "
          f"rpn={args.rpn_pre}/{args.rpn_post} band={args.band}")
    prev = None
    for stage in ("backbone+fpn", "+rpn_head", "+proposals", "+box_head",
                  "+postprocess", "+kp_head(full detect)"):
        f = jax.jit(lambda im, s=stage: detector.apply(
            det_vars, im, method=upto(s)))
        t = timeit(f, images)
        print("%-22s %8.2f ms cumulative%s"
              % (stage, t, "" if prev is None else "   (+%.2f)" % (t - prev)),
              flush=True)
        prev = t
    print("%-22s %8.2f ms  (separate run; subtract the sync constant)"
          % ("align(warp)", timeit(jax.jit(align_only), images, kps)))
    print("%-22s %8.2f ms  (separate run; subtract the sync constant)"
          % ("embed", timeit(jax.jit(
              lambda c: embedder.apply(emb_vars, c, train=False)), crops)))


if __name__ == "__main__":
    main()
