"""Shared builder for the retrieval pipeline configs.

``retrieval_config.py`` (frozen/reproduce checkpoints, the reference's
``generate_tsv_to_reproduce*.py`` wiring, ref ``:157-201``) and
``retrieval_config_dev.py`` (development checkpoints, the reference's
``generate_tsv.py`` wiring, ref ``generate_tsv.py:157-226``) differ only in
which checkpoint paths feed the 4 FE embedders. This module holds the common
machinery: checkpoint resolution, margin-head stripping, the head
(detect→align→embed) and body (detect→crop→letterbox→embed) closures.
"""

import os
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from pets_face_recognition_tpu.engine import latest_checkpoint, load_params
from pets_face_recognition_tpu.models import resnet50_embedder
from pets_face_recognition_tpu.preprocessor import Preproc3, Preproc4
from pets_face_recognition_tpu.utils.preprocs import resize_with_padding

import importlib.util as _ilu

_spec = _ilu.spec_from_file_location(
    "_pfr_pipelines", Path(__file__).parent / "pipelines.py"
)
pipelines = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(pipelines)


def _embedder_fn(name: str, env: str, default: str, input_hw: int = 224):
    from pets_face_recognition_tpu.models import ptq

    path = Path(os.environ.get(env, default))
    if path.is_dir() and not (path / "_CHECKPOINT_METADATA").exists():
        found = latest_checkpoint(path)
        if found is not None:
            path = found
    params, batch_stats = load_params(path)
    # FE checkpoints store the SoftmaxBasedMetricLearning tree; the embedder
    # lives under 'model' (margin head dropped for inference, ref
    # ``generate_tsv_to_reproduce1.py:170-171``, ``generate_tsv.py:186-187``)
    if "model" in params:
        params = params["model"]
        batch_stats = batch_stats.get("model", batch_stats)

    # serving int8 PTQ (models/ptq.py): calibrate records ranges while
    # returning the float embeddings; int8 serves the quantized trunk
    mode = ptq.quant_mode()
    if mode and "embedder" in ptq.quant_components():
        runner = ptq.PTQServing(
            name=name,
            build_fn=lambda m: resnet50_embedder(embedding_dim=512, quant=m),
            params=params, batch_stats=batch_stats,
            example=np.zeros((1, input_hw, input_hw, 3), np.float32),
        )
        return ptq.PTQModelFn(runner, mode)

    model = resnet50_embedder(embedding_dim=512)
    variables = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def fn(x):
        return model.apply(variables, x, train=False)

    return fn


def build_pipelines(fe_ckpts: dict[str, tuple[str, str]]):
    """Build ``(head_pipeline, body_pipeline)`` closures.

    ``fe_ckpts`` maps ``{"cat_head", "dog_head", "cat_body", "dog_body"}`` to
    ``(env_var, default_path)`` pairs. Animal type: 1 = dog, 2 = cat.
    """
    cat_head_fe = _embedder_fn("fe_cat_head", *fe_ckpts["cat_head"])
    dog_head_fe = _embedder_fn("fe_dog_head", *fe_ckpts["dog_head"])
    cat_body_fe = _embedder_fn("fe_cat_body", *fe_ckpts["cat_body"],
                               input_hw=256)
    dog_body_fe = _embedder_fn("fe_dog_body", *fe_ckpts["dog_body"],
                               input_hw=256)

    # detection score threshold: reference hard-codes the Preproc defaults
    # (0.9); PFR_RETRIEVAL_THR relaxes it for smoke-corpus drives where the
    # synthetic detectors are honest-but-weak (production default unchanged)
    thr = float(os.environ.get("PFR_RETRIEVAL_THR", 0.9))
    preproc3 = Preproc3(loader=pipelines.keypoint_pipeline, thr=thr,
                        base_pts=np.array([[70, 92], [154, 92], [112, 160]]),
                        dsize=(224, 224, 3))
    preproc4 = Preproc4(loader=pipelines.mask_pipeline, thr=thr)

    def _maybe_bf16(x):
        # PFR_INPUT_DTYPE=bfloat16: bf16-resident crop at the embed boundary
        # (mirrors bench.py --input-dtype; quality axis measured by
        # tools/quality_instrument.py)
        if os.environ.get("PFR_INPUT_DTYPE", "float32") == "bfloat16":
            return x.astype(jnp.bfloat16)
        return x

    def head_pipeline(img: np.ndarray, animal_type: int):
        """detect head → align → FE → 512-d vector, or None on failure
        (ref ``generate_tsv_to_reproduce1.py:203-210``)."""
        try:
            aligned = preproc3(img)
        except (AssertionError, ValueError, OSError):
            return None
        x = _maybe_bf16(jnp.asarray(aligned[None], jnp.float32) / 255.0)
        fe = dog_head_fe if animal_type == 1 else cat_head_fe
        return np.asarray(fe(x))[0]

    def body_pipeline(img: np.ndarray, animal_type: int):
        """detect body → crop → letterbox 256 → FE → 512-d vector
        (ref ``generate_tsv_to_reproduce1.py:212-221``)."""
        try:
            crop = preproc4(img)
        except (AssertionError, ValueError, OSError):
            return None
        padded = np.asarray(
            resize_with_padding(Image.fromarray(crop.astype(np.uint8)),
                                (256, 256))
        )
        x = _maybe_bf16(jnp.asarray(padded[None], jnp.float32) / 255.0)
        fe = dog_body_fe if animal_type == 1 else cat_body_fe
        return np.asarray(fe(x))[0]

    return head_pipeline, body_pipeline
