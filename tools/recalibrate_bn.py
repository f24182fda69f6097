"""Precise-BN recalibration of a live-BN detection checkpoint.

MobileNetV3's torchvision-parity BN momentum (torch 0.01 == flax 0.99,
``models/mobilenet_v3.py``) assumes ImageNet-length training. Short
from-scratch runs (the smoke recipes) leave the running statistics far from
the activation distribution — measured on the 24-epoch mobile keypoint smoke
checkpoint: RPN max objectness logit 9.3 with batch statistics vs -2.3 with
the stale running averages, i.e. eval AP pinned at 0 on a model that had in
fact learned the task. The classic fix (precise BN, e.g. Wu & Johnson,
"Rethinking 'Batch' in BatchNorm") is to recompute the running statistics
over training data AFTER training, holding the weights fixed.

This tool loads a ``results_smoke`` keypoint-mobile checkpoint, runs
``--passes`` forward passes in train mode (momentum 0.5, so ~20 passes
converge the EMA to the data distribution to ~1e-6 residual), and writes an
``epoch=<E>-step=<S+1>`` sibling checkpoint with the recalibrated
``batch_stats`` (params/opt_state unchanged), which ``latest_checkpoint``
then prefers.

Usage:
  python tools/recalibrate_bn.py --ckpt results_smoke/<run>/checkpoints \
      [--data /tmp/pfr_smoke/CAT_DATASET] [--passes 24] [--batch 4]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=Path, required=True,
                    help="checkpoints dir (or a single epoch=*-step=* entry)")
    ap.add_argument("--data", type=Path,
                    default=Path("/tmp/pfr_smoke/CAT_DATASET"))
    ap.add_argument("--passes", type=int, default=24)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=320)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the TPU backend (default: CPU — a handful "
                         "of small forwards doesn't justify claiming the "
                         "exclusively-owned chip)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        # the axon sitecustomize overrides JAX_PLATFORMS env; config wins
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pets_face_recognition_tpu.data_loading.lmd_dataset import CatLMDDataset
    from pets_face_recognition_tpu.engine import latest_checkpoint
    from pets_face_recognition_tpu.engine.checkpoint import (
        load_checkpoint,
    )
    from pets_face_recognition_tpu.models.rcnn import (
        mobile_net_v3_large_keypoint_rcnn,
    )
    from pets_face_recognition_tpu.utils.collate import DetectionCollate

    path = args.ckpt
    if path.is_dir() and not path.name.startswith("epoch="):
        path = latest_checkpoint(path)
        if path is None:
            raise SystemExit(f"no epoch=*-step=* checkpoint under {args.ckpt}")
    payload = load_checkpoint(path)
    params, stats = payload["params"], payload["batch_stats"]
    wrapped = isinstance(params, dict) and set(params) <= {"model"}
    if wrapped:  # training wraps the detector in SumDetectionLoss(model=...)
        params, stats = params["model"], stats.get("model", stats)

    ds = CatLMDDataset(str(args.data))
    collate = DetectionCollate((args.image_size, args.image_size),
                               max_boxes=2, num_keypoints=3)
    model = mobile_net_v3_large_keypoint_rcnn(frozen_stats=False,
                                              bn_momentum=0.5)

    def bn_pass(m, x):
        m.backbone(x, train=True)
        return 0

    @jax.jit
    def step(s, x):
        _, mut = model.apply({"params": params, "batch_stats": s}, x,
                             method=bn_pass, mutable=["batch_stats"])
        return mut["batch_stats"]

    rng = np.random.RandomState(args.seed)
    for it in range(args.passes):
        idx = rng.choice(len(ds), args.batch, replace=False)
        batch = collate([ds[int(i)] for i in idx])
        stats = step(stats, jnp.asarray(batch["images"]))
    stats = jax.device_get(stats)

    new_payload = dict(payload)
    new_payload["batch_stats"] = {"model": stats} if wrapped else stats
    new_payload["step"] = int(payload["step"]) + 1
    out = path.parent / (
        f"epoch={int(payload['epoch'])}-step={new_payload['step']}")
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(out.resolve(), new_payload, force=True)
    print(f"recalibrated {args.passes} passes -> {out}")


if __name__ == "__main__":
    main()
