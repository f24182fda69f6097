"""Benchmark: aligned crops/sec/chip for the full detect→align→embed pipeline.

This is the BASELINE.json headline metric (≥5000 crops/sec/chip on v5e): per
image, run a Keypoint R-CNN head+landmark detector, take the top detection's
landmarks, homography-align to the canonical 224×224 head crop
(``preprocessor/align.py`` semantics), and embed with the production ResNet-50
feature extractor — all on device (Pallas NMS / RoIAlign / warp kernels).

Detector choices (``--detector``), both reference model families:
- ``mobile`` (default): MobileNetV3-Large keypoint R-CNN — the reference's own
  lightweight serving factory (``models/detection/rcnn.py:104-126``);
- ``resnet50``: the quality model behind the README tables
  (``configs/keypoint/keypoints_config.py``).

Weights are randomly initialized (throughput is weight-independent); compute is
bfloat16 on the MXU with float32 params. Prints exactly one JSON line.

Measured on this image's v5e (batch 128 @320px, 100 steady-state iters):
mobile ≈ 5836 crops/s (chunk-skip int8 warp, int8 PTQ embedder trunk,
bf16-resident inputs, top-1 postprocess fast path, rpn budgets 24/8,
8 imgs/program, torchvision-parity windowed bicubic keypoint decode) —
1.17× the 5000 target. See PERF.md for the stage breakdown and kernel notes.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_serving_models(bf16: bool = True, detector_kind: str = "mobile",
                         rpn_pre: int = 128, rpn_post: int = 16,
                         detector_quant: str | None = None,
                         embedder_quant: str | None = None,
                         quant_fpn: bool = False, quant_rpn: bool = False,
                         kp_head_quant: str | None = None):
    """Serving detector + embedder + canonical landmarks (shared by bench.py
    and tools/profile_pipeline.py so the profiled model can't drift from the
    benchmarked one). Returns ``(detector, embedder, base_pts, dtype)``.

    ``detector_quant`` / ``embedder_quant``: None | "calibrate" | "int8" —
    the ResNet-50 trunks' serving int8 PTQ path (``models/quant.py``); the
    detector knob applies to the resnet50 detector only (the mobile detector
    is MobileNetV3)."""
    import jax.numpy as jnp

    from pets_face_recognition_tpu.models import resnet50_embedder
    from pets_face_recognition_tpu.models.fpn import BackboneWithFPN
    from pets_face_recognition_tpu.models.rcnn import GeneralizedRCNN, RCNNConfig
    from pets_face_recognition_tpu.models.mobilenet_v3 import mobilenet_v3_large
    from pets_face_recognition_tpu.models.resnet import resnet50

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    # serving budgets: one pet head per image — 128/16 proposals lose nothing
    # on single-object images and keep NMS + RoI work small (the box
    # RoIAlign+head stage scales linearly with rpn_post; quality configs keep
    # the torchvision 1000/1000 defaults)
    budgets = dict(
        num_classes=2, num_keypoints=3, box_detections_per_img=1,
        rpn_pre_nms_top_n_test=rpn_pre, rpn_post_nms_top_n_test=rpn_post,
    )
    if detector_kind == "mobile":
        # the reference's own lightweight serving detector
        # (models/detection/rcnn.py:104-126): MobileNetV3-Large keypoint R-CNN
        det_cfg = RCNNConfig(
            anchor_sizes=((32, 64, 128, 256, 512),) * 3,
            aspect_ratios=(0.5, 1.0, 2.0),
            **budgets,
        )
        det_backbone = BackboneWithFPN(
            backbone=mobilenet_v3_large(features_only=True, dtype=dtype),
            in_levels=("c4", "c5"), dtype=dtype,
        )
    else:
        det_cfg = RCNNConfig(**budgets)
        det_backbone = BackboneWithFPN(
            backbone=resnet50(features_only=True, frozen_stats=True,
                              dtype=dtype, quant=detector_quant),
            dtype=dtype, quant=detector_quant if quant_fpn else None,
        )
    detector = GeneralizedRCNN(
        backbone=det_backbone, cfg=det_cfg, dtype=dtype,
        quant=detector_quant if quant_rpn else None,
        quant_kp=kp_head_quant)
    embedder = resnet50_embedder(embedding_dim=512, dtype=dtype,
                                 quant=embedder_quant)
    base_pts = jnp.asarray([[70.0, 92.0], [154.0, 92.0], [112.0, 160.0]])
    return detector, embedder, base_pts, dtype


def build_pipeline(batch_size: int, image_size: int, bf16: bool = True,
                   detector_kind: str = "mobile", rpn_pre: int = 128,
                   rpn_post: int = 16, band: int = 80,
                   warp_dtype: str = "bfloat16", input_dtype: str = "bfloat16",
                   int8_detector: bool = False, int8_embedder: bool = False,
                   int8_detector_scope: str = "rpn",
                   int8_kp_head: bool = True, detect_split: bool = False):
    import jax
    import jax.numpy as jnp

    from pets_face_recognition_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    det_q = "int8" if (int8_detector and detector_kind == "resnet50") else None
    emb_q = "int8" if int8_embedder else None
    # measured (PERF.md round 5 sweep, budgets 24/8): trunk 2422 / +fpn 2544
    # / +rpn 2582 / full 1879 crops/s single-module — the fpn×rpn
    # composition pathology is a cross-stage scheduling artifact of the
    # remote compiler: with the detect graph SPLIT at the RoI boundary
    # (--detect-split) full composes properly at **2758** and is the
    # production scope; the split is auto-enabled for scope=full
    q_fpn = int8_detector_scope in ("fpn", "full")
    q_rpn = int8_detector_scope in ("rpn", "full")
    kp_q = "int8" if int8_kp_head else None
    detector, embedder, base_pts, dtype = build_serving_models(
        bf16=bf16, detector_kind=detector_kind, rpn_pre=rpn_pre,
        rpn_post=rpn_post, detector_quant=det_q, embedder_quant=emb_q,
        quant_fpn=q_fpn, quant_rpn=q_rpn, kp_head_quant=kp_q)
    if det_q or emb_q or kp_q:
        # calibrate twins: same trees, real-precision forward; their init IS
        # the calibration pass (models/quant.py), the int8 twins then consume
        # the resulting variables
        det_init, emb_init, _, _ = build_serving_models(
            bf16=bf16, detector_kind=detector_kind, rpn_pre=rpn_pre,
            rpn_post=rpn_post,
            detector_quant="calibrate" if det_q else None,
            embedder_quant="calibrate" if emb_q else None,
            quant_fpn=q_fpn, quant_rpn=q_rpn,
            kp_head_quant="calibrate" if kp_q else None)
    else:
        det_init, emb_init = detector, embedder

    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(
        np.random.RandomState(0).rand(batch_size, image_size, image_size, 3),
        jnp.float32,
    )
    det_vars = jax.jit(lambda r, x: det_init.init(r, x, train=False))(rng, images)
    if input_dtype == "bfloat16":
        # bf16-resident input batch: production ingest is uint8 JPEG pixels →
        # one cast at the device boundary; keeping the resident batch bf16
        # halves BOTH full-image HBM reads (detector first conv + warp source
        # quantize — ~315 MB/batch f32 → ~157 MB). Pixel error 2^-9 relative,
        # far below the warp's int8 127-level quantization step.
        images = images.astype(jnp.bfloat16)
    # uniform-[0,1] init crops: with the int8 trunk the init pass doubles as
    # activation-range calibration, so feed it the bench input distribution
    # (zeros would calibrate scales to ~0 and saturate every layer)
    emb_vars = jax.jit(emb_init.init)(
        rng, jnp.asarray(np.random.RandomState(1).rand(
            batch_size, 224, 224, 3), jnp.float32)
    )

    if bf16:
        # serving-resident bf16 weights: flax casts f32 params to the compute
        # dtype on every apply — a full HBM pass over ~100 MB of ResNet-50
        # weights per batch. Casting the big tensors once at setup removes it
        # (1-D leaves — biases, BN scale/bias/stats — stay f32 for precision;
        # their traffic is negligible). Same ~0.4% weight quantization class
        # as bf16 activations.
        def _resident_bf16(tree):
            return jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if (hasattr(x, "ndim") and x.ndim >= 2
                    and x.dtype == jnp.float32) else x,
                tree,
            )

        emb_vars = {"params": _resident_bf16(emb_vars["params"]),
                    **{k: v for k, v in emb_vars.items() if k != "params"}}
        det_vars = {"params": _resident_bf16(det_vars["params"]),
                    **{k: v for k, v in det_vars.items() if k != "params"}}

    # two jits: detector | align+embed — the single fused module serializes past
    # the remote compiler's request-size limit; the seam costs one dispatch and
    # keeps everything on device
    if detect_split:
        # third seam at the RoI boundary (PERF.md int8 composition pathology):
        # the int8 producer chains (backbone/FPN/RPN head) and the RoI
        # consumer stages compile as separate XLA modules, denying the remote
        # scheduler the cross-stage plan that balloons scope=full
        @jax.jit
        def det_producer(imgs):
            return detector.apply(det_vars, imgs, method="backbone_rpn")

        @jax.jit
        def det_consumer(feats, obj, deltas):
            dets = detector.apply(det_vars, feats, obj, deltas,
                                  (image_size, image_size), method="roi_eval")
            return dets["keypoints"][:, 0, :, :2]

        def detect(imgs):
            return det_consumer(*det_producer(imgs))
    else:
        @jax.jit
        def detect(imgs):
            dets = detector.apply(det_vars, imgs, train=False)
            return dets["keypoints"][:, 0, :, :2]  # (B, 3, 2) top detection

    from pets_face_recognition_tpu.ops.homography import solve_homography
    from pets_face_recognition_tpu.ops.pallas_warp import warp_affine_batch_pallas

    @jax.jit
    def align_embed(imgs, kps):
        base = jnp.broadcast_to(base_pts, (imgs.shape[0], 3, 2))
        # production align() semantics: landmarks rounded to the int grid
        # (ref preprocessor/__init__.py:181), both prepended centroids rounded
        # (ref preprocessor/align.py:8-9) — the resulting homography is
        # slightly PROJECTIVE; the Pallas kernel's rational divide handles it
        kps = jnp.round(kps)
        src4 = jnp.concatenate([jnp.round(kps.mean(axis=1, keepdims=True)),
                                kps], axis=1)
        dst4 = jnp.concatenate([jnp.round(base.mean(axis=1, keepdims=True)),
                                base], axis=1)
        Hs = solve_homography(src4, dst4)
        # band narrows the warp kernel's static y-band (MXU work is
        # proportional): 96 admits rotations to ~±13deg at alignment scale,
        # clamping gracefully beyond. int8 warp mode: 2x MXU rate, ~0.6% pixel
        # quantization (vs bf16's 0.4%) — both below JPEG noise; requires
        # [0, 1] pixel inputs
        wdt = jnp.int8 if warp_dtype == "int8" else jnp.bfloat16
        # bf16 crop output: halves the crop buffer write + the embedder's
        # first read (the embedder computes in bf16 anyway)
        crops = warp_affine_batch_pallas(imgs, Hs, (224, 224),
                                         compute_dtype=wdt, band=band,
                                         out_dtype=jnp.bfloat16)
        return embedder.apply(emb_vars, crops, train=False)

    def pipeline(imgs):
        return align_embed(imgs, detect(imgs))

    return pipeline, images


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--image-size", type=int, default=320)
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--passes", type=int, default=3,
                        help="measurement passes; the fastest is reported "
                             "(tunnel-transient rejection)")
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--no-bf16", action="store_true")
    parser.add_argument("--band", type=int, default=80,
                        help="warp kernel y-band (rotation envelope knob; "
                             "128 admits ~±17deg at alignment scale, 96 ~±13, "
                             "80 ~±10; beyond the envelope the crop's far "
                             "rows clamp gracefully at the band edge)")
    parser.add_argument("--input-dtype", choices=("float32", "bfloat16"),
                        default="bfloat16",
                        help="resident dtype of the input image batch "
                             "(bfloat16 halves both full-image HBM reads; "
                             "production ingest is uint8 anyway)")
    parser.add_argument("--warp-dtype", choices=("bfloat16", "int8"),
                        default="int8",
                        help="warp kernel MXU dtype (default int8: 2x MXU "
                             "rate, ~1%% pixel quantization — below JPEG "
                             "noise; bfloat16 for the 0.4%%-error path)")
    parser.add_argument("--rpn-pre", type=int, default=24,
                        help="RPN pre-NMS proposal budget (serving knob; "
                             "box_detections_per_img=1 keeps only the best "
                             "region, so single-pet serving loses nothing)")
    parser.add_argument("--rpn-post", type=int, default=8,
                        help="RPN post-NMS proposal budget (serving knob)")
    parser.add_argument("--detector", choices=("mobile", "resnet50"),
                        default="mobile",
                        help="serving detector: the reference's lightweight "
                             "MobileNetV3 keypoint R-CNN (default) or the "
                             "ResNet-50 quality model")
    parser.add_argument("--int8-detector", action="store_true",
                        help="int8 PTQ trunk for the resnet50 detector "
                             "backbone (models/quant.py; no-op for mobile)")
    parser.add_argument("--detect-split", action="store_true", default=None,
                        dest="detect_split",
                        help="compile the detector as two XLA modules split "
                             "at the RoI boundary (defeats the remote "
                             "compiler's cross-stage scheduling pathology "
                             "for scope=full; costs one dispatch + pyramid "
                             "HBM round-trip). Default: auto — ON for "
                             "--int8-detector-scope full, OFF otherwise")
    parser.add_argument("--no-detect-split", action="store_false",
                        dest="detect_split")
    parser.add_argument("--int8-detector-scope",
                        choices=("trunk", "fpn", "rpn", "full"),
                        default="full",
                        help="which detector stages run int8 under "
                             "--int8-detector: trunk only, trunk+FPN, "
                             "trunk+RPN, or all (default — fastest WITH the "
                             "auto detect-split; round-5 sweep in PERF.md)")
    parser.add_argument("--int8-kp-head", dest="int8_kp_head",
                        action="store_true", default=True,
                        help="int8 PTQ for the keypoint head's 8-conv chain "
                             "(both detector kinds; models/quant.py; "
                             "default ON — mobile 5832→6537 crops/s)")
    parser.add_argument("--no-int8-kp-head", dest="int8_kp_head",
                        action="store_false",
                        help="keypoint head conv chain in the compute dtype")
    parser.add_argument("--int8-embedder", dest="int8_embedder",
                        action="store_true", default=True,
                        help="int8 PTQ trunk for the ResNet-50 embedder "
                             "(default ON: per-channel-weight / per-tensor-"
                             "activation symmetric PTQ, embedding cosine "
                             ">0.99 vs float — tests/test_quant.py)")
    parser.add_argument("--no-int8-embedder", dest="int8_embedder",
                        action="store_false",
                        help="run the embedder trunk in bfloat16")
    args = parser.parse_args()

    import jax

    if args.detect_split is None:
        # auto: the RoI-boundary split is what makes scope=full compose
        # (PERF.md round-5 sweep); everywhere else it just costs a seam
        args.detect_split = (args.int8_detector
                             and args.detector == "resnet50"
                             and args.int8_detector_scope == "full")
    pipeline, images = build_pipeline(args.batch_size, args.image_size,
                                      bf16=not args.no_bf16,
                                      detector_kind=args.detector,
                                      rpn_pre=args.rpn_pre,
                                      rpn_post=args.rpn_post,
                                      band=args.band,
                                      warp_dtype=args.warp_dtype,
                                      input_dtype=args.input_dtype,
                                      int8_detector=args.int8_detector,
                                      int8_embedder=args.int8_embedder,
                                      int8_detector_scope=args.int8_detector_scope,
                                      int8_kp_head=args.int8_kp_head,
                                      detect_split=args.detect_split)
    # compile + warmup
    out = pipeline(images)
    jax.block_until_ready(out)
    for _ in range(args.warmup):
        jax.block_until_ready(pipeline(images))

    # best-of-passes timing: the axon tunnel occasionally stalls dispatches
    # for a few ms, and a single pass folds that transient into the mean.
    # Windows SHORTER than a full pass measure slower here — the boundary
    # block_until_ready is a tunnel round-trip (~30 ms) that also drains the
    # dispatch queue (measured: 5x20-iter windows report 4755 vs 5000 for one
    # 100-iter window). So keep each pass long (full `iters`, pipelined
    # dispatch, one sync) and take the fastest of a few passes.
    best_dt = float("inf")
    for _ in range(args.passes):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = pipeline(images)
        jax.block_until_ready(out)
        best_dt = min(best_dt, time.perf_counter() - t0)

    crops_per_sec = args.batch_size * args.iters / best_dt
    baseline = 5000.0
    # the run is self-describing: the quality-envelope knobs (quantization
    # scopes, warp band/dtype, input dtype, proposal budgets) ride along so a
    # recorded number can never be mistaken for a differently-configured
    # pipeline's (ADVICE r3). Fidelity of the default config vs float is
    # pinned in PERF.md ("rank safety") and tests/test_quant.py.
    print(json.dumps({
        "metric": "aligned_crops_per_sec_per_chip",
        "value": round(crops_per_sec, 2),
        "unit": "crops/s",
        "vs_baseline": round(crops_per_sec / baseline, 4),
        "detector": args.detector,
        "batch_size": args.batch_size,
        "config": {
            "band": args.band,
            "warp_dtype": args.warp_dtype,
            "input_dtype": args.input_dtype,
            "rpn_pre": args.rpn_pre,
            "rpn_post": args.rpn_post,
            "int8_embedder": args.int8_embedder,
            "int8_kp_head": args.int8_kp_head,
            "int8_detector": args.int8_detector,
            "int8_detector_scope": (args.int8_detector_scope
                                    if args.int8_detector else None),
            "detect_split": args.detect_split,
        },
    }))


if __name__ == "__main__":
    main()
