"""Reference-checkpoint import path, locked offline.

The production torch checkpoints (``to_reproduce.zip``,
``/root/reference/download_models.py:5-23``) can't be downloaded in this
image, so ``utils/torchvision_layouts.py`` synthesizes state dicts with their
EXACT key sets/shapes and this test drives the full turnkey importer
(``tools/import_reference_weights.py``) over them:

- all six checkpoints convert with strict key accounting (every torch key
  consumed or known-ignored) and two-direction tree equality vs the flax
  init trees (structure + shapes);
- both torchvision layouts convert (0.12 flat — the production zip — and
  ≥0.14 Conv2dNormActivation-nested re-exports);
- the written orbax checkpoints are consumable by the production loaders
  (``load_params`` + ``model``-wrapper strip → apply);
- layout drift fails loudly (unknown keys raise, missing leaves raise).
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pets_face_recognition_tpu.engine import load_params  # noqa: E402
from pets_face_recognition_tpu.models import resnet50_embedder  # noqa: E402
from pets_face_recognition_tpu.utils.torchvision_layouts import (  # noqa: E402
    fe_controller_sd,
    keypointrcnn_resnet50_fpn_sd,
    maskrcnn_resnet50_fpn_sd,
)

_spec = importlib.util.spec_from_file_location(
    "import_reference_weights",
    Path(__file__).resolve().parents[1] / "tools" / "import_reference_weights.py",
)
irw = importlib.util.module_from_spec(_spec)
sys.modules["import_reference_weights"] = irw
_spec.loader.exec_module(irw)


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("to_reproduce")
    irw.synth_to_reproduce(out)
    return out


def test_full_manifest_imports(synth_dir, tmp_path):
    """All six production checkpoints convert + save with strict checks."""
    for rel, kind, epoch, out_rel in irw.MANIFEST:
        path = irw.import_checkpoint(synth_dir / rel, kind, epoch,
                                     tmp_path / out_rel)
        assert path.exists(), path
        assert path.name == f"epoch={epoch}-step=0"

    # the FE orbax payload feeds the production consumption path: strip the
    # loss-wrapper 'model' level, apply the embedder
    # (configs/retrieval_common.py::_embedder_fn)
    params, stats = load_params(
        tmp_path / "cat_fe/checkpoints/epoch=42-step=0")
    assert set(params) == {"model"}
    emb = resnet50_embedder(embedding_dim=512).apply(
        {"params": params["model"], "batch_stats": stats["model"]},
        jnp.zeros((1, 224, 224, 3), jnp.float32), train=False)
    assert emb.shape == (1, 512)
    assert bool(jnp.all(jnp.isfinite(emb)))


@pytest.mark.parametrize("kind,builder", [
    ("mask", maskrcnn_resnet50_fpn_sd),
    ("keypoint", keypointrcnn_resnet50_fpn_sd),
])
def test_nested_014_layout_converts(kind, builder):
    """torchvision ≥0.14 Conv2dNormActivation re-nesting also converts, with
    the same strict two-direction tree equality."""
    sd = builder(np.random.RandomState(1), nested=True)
    params, stats = irw.convert_one(sd, kind)
    assert "fpn" in params["backbone"] and len(params["backbone"]["fpn"]) == 8


def test_unknown_key_fails_loudly(synth_dir):
    sd = {k: np.asarray(v)
          for k, v in torch.load(synth_dir / "mask/epoch=64.ckpt").items()}
    sd["model.roi_heads.novel_head.weight"] = np.zeros(3, np.float32)
    with pytest.raises(KeyError, match="unrecognized"):
        irw.convert_one(sd, "mask")


def test_missing_tensor_fails_loudly(synth_dir):
    sd = {k: np.asarray(v)
          for k, v in torch.load(synth_dir / "keypoint/epoch=14.ckpt").items()}
    del sd["model.roi_heads.keypoint_predictor.kps_score_lowres.weight"]
    del sd["model.roi_heads.keypoint_predictor.kps_score_lowres.bias"]
    with pytest.raises(KeyError):
        irw.convert_one(sd, "keypoint")


def test_margin_head_variants(synth_dir):
    """v1.0 (uncut add_margin) and v1.2 (cut) FE checkpoints both import; the
    margin tensor is on the known-ignored list, not an error."""
    rng = np.random.RandomState(2)
    for include_margin in (False, True):
        sd = fe_controller_sd(rng, num_class=17, include_margin=include_margin)
        params, _ = irw.convert_one(sd, "fe")
        assert set(params) == {"backbone", "fc"}
        assert params["fc"]["kernel"].shape == (2048, 512)


def test_converted_mask_model_runs(synth_dir):
    """Converted Mask R-CNN weights drive a real forward (the keypoint
    variant's forward is covered in test_detection_convert.py)."""
    from pets_face_recognition_tpu.models.rcnn import maskrcnn_resnet50_fpn

    sd = {k: np.asarray(v)
          for k, v in torch.load(synth_dir / "mask/epoch=64.ckpt").items()}
    params, stats = irw.convert_one(sd, "mask")
    model = maskrcnn_resnet50_fpn(num_classes=2, box_detections_per_img=3,
                                  rpn_pre_nms_top_n_test=50,
                                  rpn_post_nms_top_n_test=20)
    dets = model.apply({"params": params, "batch_stats": stats},
                       jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    assert dets["boxes"].shape[0] == 1
    assert bool(jnp.all(jnp.isfinite(dets["scores"])))
