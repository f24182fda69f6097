"""Retrieval pipelines: detect→align/crop→embed closures for ``generate_tsv*``.

The reference loads 4 FE controllers (cat/dog × head/body) with the margin head
stripped (``generate_tsv_to_reproduce1.py:157-201``); here each pipeline holds the
two detectors plus the four embedders and dispatches on the card's animal type
(1 = dog, 2 = cat).

Checkpoint env overrides: ``PFR_{CAT,DOG}_{HEAD,BODY}_FE_CKPT`` plus the detector
variables from ``configs/pipelines.py``.
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
_pipelines = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_pipelines)


def _embedder_fn(env: str, default: str):
    path = Path(os.environ.get(env, default))
    if path.is_dir() and not (path / "_CHECKPOINT_METADATA").exists():
        found = latest_checkpoint(path)
        if found is not None:
            path = found
    model = resnet50_embedder(embedding_dim=512)
    params, batch_stats = load_params(path)
    # FE checkpoints store the SoftmaxBasedMetricLearning tree; the embedder
    # lives under 'model' (margin head dropped for inference, ref :170-171)
    if "model" in params:
        params = params["model"]
        batch_stats = batch_stats.get("model", batch_stats)
    variables = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def fn(x):
        return model.apply(variables, x, train=False)

    return fn


_cat_head_fe = _embedder_fn("PFR_CAT_HEAD_FE_CKPT", "results/cat_fe/checkpoints")
_dog_head_fe = _embedder_fn("PFR_DOG_HEAD_FE_CKPT", "results/dog_fe/checkpoints")
_cat_body_fe = _embedder_fn("PFR_CAT_BODY_FE_CKPT",
                            "results/cat_body_fe/checkpoints")
_dog_body_fe = _embedder_fn("PFR_DOG_BODY_FE_CKPT",
                            "results/dog_body_fe/checkpoints")

_preproc3 = Preproc3(loader=_pipelines.keypoint_pipeline,
                     base_pts=np.array([[70, 92], [154, 92], [112, 160]]),
                     dsize=(224, 224, 3))
_preproc4 = Preproc4(loader=_pipelines.mask_pipeline)


def head_pipeline(img: np.ndarray, animal_type: int):
    """detect head → align → FE → 512-d vector, or None on failure
    (ref ``:203-210``)."""
    try:
        aligned = _preproc3(img)
    except (AssertionError, ValueError, OSError):
        return None
    x = jnp.asarray(aligned[None], jnp.float32) / 255.0
    fe = _dog_head_fe if animal_type == 1 else _cat_head_fe
    return np.asarray(fe(x))[0]


def body_pipeline(img: np.ndarray, animal_type: int):
    """detect body → crop → letterbox 256 → FE → 512-d vector (ref ``:212-221``)."""
    try:
        crop = _preproc4(img)
    except (AssertionError, ValueError, OSError):
        return None
    padded = np.asarray(
        resize_with_padding(Image.fromarray(crop.astype(np.uint8)), (256, 256))
    )
    x = jnp.asarray(padded[None], jnp.float32) / 255.0
    fe = _dog_body_fe if animal_type == 1 else _cat_body_fe
    return np.asarray(fe(x))[0]
