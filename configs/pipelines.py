"""Inference-pipeline factories: jitted detector forwards from checkpoints.

Used by ``prepare_tables.py`` / ``transform_*.py`` / ``generate_tsv*.py`` the way
the reference pipelines hard-code their ``configs/to_reproduce/**`` torch
checkpoints (``preprocessor/__init__.py:205-208,263-266``). Each factory returns a
``model_fn(images) -> detections`` closure over frozen variables.

Checkpoint locations (override via env):
- ``PFR_KEYPOINT_CKPT`` (default ``results/keypoint/checkpoints`` latest)
- ``PFR_MASK_CKPT``     (default ``results/mask/checkpoints`` latest)
"""

import os
from pathlib import Path

import jax

from pets_face_recognition_tpu.engine import latest_checkpoint, load_params
from pets_face_recognition_tpu.models import ptq
from pets_face_recognition_tpu.models.rcnn import (
    keypointrcnn_resnet50_fpn,
    maskrcnn_resnet50_fpn,
)

_INPUT_SIZE = (320, 320)


def _resolve(env: str, default: str) -> Path:
    path = Path(os.environ.get(env, default))
    if path.is_dir() and not (path / "_CHECKPOINT_METADATA").exists():
        found = latest_checkpoint(path)
        if found is not None:
            return found
    return path


def _load_unwrapped(ckpt_path: Path):
    params, batch_stats = load_params(ckpt_path)
    # training wraps the detector in the config's loss module
    # (``SumDetectionLoss(model=...)``), so checkpoint params live under
    # 'model' — strip the wrapper prefix for bare-model inference (same
    # unwrap as configs/retrieval_config.py; ref strips ``add_margin``,
    # generate_tsv_to_reproduce1.py:170-171)
    if isinstance(params, dict) and set(params) <= {"model"}:
        params = params.get("model", {})
        batch_stats = batch_stats.get("model", batch_stats)
    return params, batch_stats


def _jitted_forward(model, ckpt_path: Path):
    params, batch_stats = _load_unwrapped(ckpt_path)
    variables = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def model_fn(images):
        return model.apply(variables, images, train=False)

    return model_fn


def _detector_fn(name: str, build_fn, ckpt_path: Path,
                 supports: tuple = ("detector", "kp_head")):
    """Float / calibrate / int8 detector forward per the process quant mode
    (``models/ptq.py``): ``build_fn(quant, quant_kp)`` builds the model.

    ``supports`` lists which quant components this factory's model actually
    consumes (mask R-CNN has no keypoint head; the mobile trunk has no int8
    path) — a selected-but-unsupported component must fall back to float
    instead of building a quant-less PTQ twin (which would raise).
    """
    import numpy as np

    mode = ptq.quant_mode()
    comps = ptq.quant_components() & set(supports)
    if mode:
        # an int8/calibrate run that silently drops a requested component
        # reads as "int8" in bench/quality labels while actually running
        # float — say so (ADVICE r4 #1)
        dropped = (ptq.quant_components() & {"detector", "kp_head"}) - comps
        if dropped:
            print(f"PTQ: {name}: requested quant component(s) "
                  f"{sorted(dropped)} unsupported by this factory — "
                  f"falling back to float for those stages")
    det_q = mode if (mode and "detector" in comps) else None
    kp_q = mode if (mode and "kp_head" in comps) else None
    if det_q is None and kp_q is None:
        if mode:
            print(f"PTQ: {name}: no supported quant components selected "
                  f"under PFR_QUANT_MODE={mode!r} — serving FLOAT")
        return _jitted_forward(build_fn(None, None), ckpt_path)

    params, batch_stats = _load_unwrapped(ckpt_path)
    runner = ptq.PTQServing(
        name=name,
        build_fn=lambda m: build_fn(m if det_q else None,
                                    m if kp_q else None),
        params=params, batch_stats=batch_stats,
        example=np.zeros((1, *_INPUT_SIZE, 3), np.float32),
    )
    return ptq.PTQModelFn(runner, mode)


# Dataset-version ablation checkpoints (reference Preproc7-13 each hard-code a
# distinct mlruns keypoint checkpoint, ``/root/reference/preprocessor/__init__.py:322-610``):
#   prod -> epoch=14 (Preproc3/6/13), v2 -> mlruns 654e1dcc epoch=11 (Preproc7/8),
#   v3 -> mlruns 8b15c649 epoch=5 (Preproc9/10), v4 -> mlruns 8d5b5fd1 epoch=12
#   (Preproc11/12).
KEYPOINT_VARIANTS = {
    "prod": ("PFR_KEYPOINT_CKPT", "results/keypoint/checkpoints"),
    "v2": ("PFR_KEYPOINT_CKPT_V2", "results/keypoint_v2/checkpoints"),
    "v3": ("PFR_KEYPOINT_CKPT_V3", "results/keypoint_v3/checkpoints"),
    "v4": ("PFR_KEYPOINT_CKPT_V4", "results/keypoint_v4/checkpoints"),
}


def keypoint_pipeline(variant: str = "prod"):
    env, default = KEYPOINT_VARIANTS[variant]
    ckpt = _resolve(env, default)
    arch = os.environ.get("PFR_KEYPOINT_ARCH", "resnet50")
    if arch == "mobile":
        # the reference's lightweight serving factory
        # (models/detection/rcnn.py:104-126) — checkpoint must match
        # (train configs/smoke/keypoint_mobile_smoke.py or import real
        # weights); its MBv3 trunk has no int8 path, quant_kp still applies
        from pets_face_recognition_tpu.models.rcnn import (
            mobile_net_v3_large_keypoint_rcnn,
        )

        return _detector_fn(
            f"det_keypoint_mobile_{variant}",
            lambda q, qkp: mobile_net_v3_large_keypoint_rcnn(quant_kp=qkp),
            ckpt, supports=("kp_head",))
    if arch != "resnet50":
        raise ValueError(f"PFR_KEYPOINT_ARCH={arch!r}: resnet50 | mobile")
    return _detector_fn(
        f"det_keypoint_{variant}",
        lambda q, qkp: keypointrcnn_resnet50_fpn(
            num_classes=2, num_keypoints=3, box_detections_per_img=1,
            quant=q, quant_kp=qkp),
        ckpt)


def mask_pipeline():
    ckpt = _resolve("PFR_MASK_CKPT", "results/mask/checkpoints")
    return _detector_fn(
        "det_mask",
        lambda q, qkp: maskrcnn_resnet50_fpn(
            num_classes=2, box_detections_per_img=3, quant=q),
        ckpt, supports=("detector",))


input_size = _INPUT_SIZE
