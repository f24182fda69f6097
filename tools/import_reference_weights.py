"""Turnkey reference-checkpoint importer: ``to_reproduce.zip`` → orbax.

The reference ships six torch checkpoints (``download_models.py:5-23``,
Zenodo record 6761880). This tool converts ALL of them into this framework's
orbax layout in one shot, with strict accounting — every torch key must be
either consumed by a converter or on the model's known-ignored list, and the
converted tree must match the flax model's init tree EXACTLY (both
directions, shapes included) before anything is written.

Usage (the moment the zip lands):

    python tools/import_reference_weights.py --zip to_reproduce.zip
    # or, if already extracted to configs/to_reproduce:
    python tools/import_reference_weights.py --dir configs/to_reproduce

Offline drill (no zip needed — synthesizes state dicts with the exact
production key layouts from ``utils/torchvision_layouts.py``):

    python tools/import_reference_weights.py --synth /tmp/to_reproduce

Outputs (under ``--out``, default ``configs/to_reproduce``):

    mask/checkpoints/epoch=64-step=0        ← mask/epoch=64.ckpt
    keypoint/checkpoints/epoch=14-step=0    ← keypoint/epoch=14.ckpt
    cat_fe/checkpoints/epoch=42-step=0      ← cat_fe/epoch=42_head.ckpt
    dog_fe/checkpoints/epoch=36-step=0      ← dog_fe/epoch=36_head.ckpt
    cat_fe/checkpoints_body/epoch=39-step=0 ← cat_fe/epoch=39_body.ckpt
    dog_fe/checkpoints_body/epoch=37-step=0 ← dog_fe/epoch=37_body.ckpt

These are the default/env paths the entry points consume (``eval_detection``,
``eval_landmark``, ``eval_fe_*``, ``configs/pipelines.py``,
``configs/retrieval_config.py``); ``tools/run_real_weights_parity.sh`` chains
the full eval → tables → score → tsv reproduction from here.
"""

from __future__ import annotations

import argparse
import re
import sys
import zipfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# (relative ckpt path in the zip, kind, epoch, output checkpoints dir)
MANIFEST = [
    ("mask/epoch=64.ckpt", "mask", 64, "mask/checkpoints"),
    ("keypoint/epoch=14.ckpt", "keypoint", 14, "keypoint/checkpoints"),
    ("cat_fe/epoch=42_head.ckpt", "fe", 42, "cat_fe/checkpoints"),
    ("dog_fe/epoch=36_head.ckpt", "fe", 36, "dog_fe/checkpoints"),
    ("cat_fe/epoch=39_body.ckpt", "fe", 39, "cat_fe/checkpoints_body"),
    ("dog_fe/epoch=37_body.ckpt", "fe", 37, "dog_fe/checkpoints_body"),
]

# Strict key accounting: every state-dict key must match exactly one class.
_DET_CONSUMED = [
    r"model\.backbone\.body\.(conv1|bn1)\.\w+",
    r"model\.backbone\.body\.layer\d+\.\d+\.(conv\d|bn\d|downsample\.[01])\.\w+",
    r"model\.backbone\.fpn\.(inner|layer)_blocks\.\d(\.0)?\.(weight|bias)",
    r"model\.rpn\.head\.(conv(\.0\.0)?|cls_logits|bbox_pred)\.(weight|bias)",
    r"model\.roi_heads\.box_head\.fc[67]\.(weight|bias)",
    r"model\.roi_heads\.box_predictor\.(cls_score|bbox_pred)\.(weight|bias)",
]
_CONSUMED = {
    "mask": _DET_CONSUMED + [
        r"model\.roi_heads\.mask_head\.(mask_fcn\d|\d\.0)\.(weight|bias)",
        r"model\.roi_heads\.mask_predictor\.(conv5_mask|mask_fcn_logits)\.(weight|bias)",
    ],
    "keypoint": _DET_CONSUMED + [
        r"model\.roi_heads\.keypoint_head\.\d+\.(weight|bias)",
        r"model\.roi_heads\.keypoint_predictor\.kps_score_lowres\.(weight|bias)",
    ],
    "fe": [
        r"model\.model\.(conv1|bn1|fc)\.\w+",
        r"model\.model\.layer\d+\.\d+\.(conv\d|bn\d|downsample\.[01])\.\w+",
    ],
}
# Non-weight / stripped-at-inference keys, fine to skip:
_IGNORED = {
    "mask": [r".*num_batches_tracked"],
    "keypoint": [r".*num_batches_tracked"],
    "fe": [
        r".*num_batches_tracked",
        r"model\.add_margin\..*",   # cut in shipped ckpts (download_models.py:8-9)
        r"model\.focal_loss\..*",   # only exists with adaptive alpha
    ],
}


def classify_keys(sd: dict, kind: str) -> None:
    """Raise on any key that is neither consumed nor known-ignored."""
    unknown = []
    for k in sd:
        if any(re.fullmatch(p, k) for p in _CONSUMED[kind]):
            continue
        if any(re.fullmatch(p, k) for p in _IGNORED[kind]):
            continue
        unknown.append(k)
    if unknown:
        raise KeyError(
            f"{kind}: {len(unknown)} unrecognized checkpoint key(s) — the "
            f"layout drifted from utils/torchvision_layouts.py; first few: "
            f"{unknown[:8]}")


def _tree_check(converted_params, converted_stats, kind: str) -> None:
    """Converted tree ≡ flax init tree, both directions, shapes included."""
    import jax
    import jax.numpy as jnp

    from pets_face_recognition_tpu.utils.torch_convert import assert_tree_shapes

    if kind == "fe":
        from pets_face_recognition_tpu.models import resnet50_embedder
        model = resnet50_embedder(embedding_dim=512)
        init = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 224, 224, 3), jnp.float32))
    else:
        from pets_face_recognition_tpu.models.rcnn import (
            keypointrcnn_resnet50_fpn,
            maskrcnn_resnet50_fpn,
        )
        model = (maskrcnn_resnet50_fpn(num_classes=2) if kind == "mask"
                 else keypointrcnn_resnet50_fpn(num_classes=2, num_keypoints=3))
        init = jax.eval_shape(
            lambda r, x: model.init(
                {"params": r, "sampler": jax.random.PRNGKey(0)}, x,
                train=False),
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert_tree_shapes(init["params"], converted_params)       # init ⊆ converted
    assert_tree_shapes(converted_params, init["params"])       # converted ⊆ init
    init_stats = init.get("batch_stats", {})
    assert_tree_shapes(init_stats, converted_stats)
    assert_tree_shapes(converted_stats, init_stats)


def convert_one(sd: dict[str, np.ndarray], kind: str):
    from pets_face_recognition_tpu.utils.torch_convert import (
        convert_detection_model,
        convert_fe_embedder,
    )

    classify_keys(sd, kind)
    if kind == "mask":
        params, stats = convert_detection_model(sd, with_mask=True,
                                                prefix="model.")
    elif kind == "keypoint":
        params, stats = convert_detection_model(sd, num_keypoints=3,
                                                prefix="model.")
    else:
        params, stats = convert_fe_embedder(sd, prefix="model.model.")
    _tree_check(params, stats, kind)
    return params, stats


def import_checkpoint(ckpt_path: Path, kind: str, epoch: int, out_dir: Path) -> Path:
    import torch

    from pets_face_recognition_tpu.utils.torch_convert import state_dict_to_numpy

    # the downloaded zip is untrusted public content: weights_only=True keeps
    # unpickling tensor-only regardless of the torch version's default (on
    # torch<2.6 the default is arbitrary-code-execution)
    try:
        sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    except Exception as e:  # pickle.UnpicklingError subclass varies by version
        raise RuntimeError(
            f"{ckpt_path}: failed under weights_only=True — the checkpoint "
            "contains non-tensor python objects (e.g. lightning hyperparams). "
            "Re-export a plain state_dict, or inspect the file before loading "
            "it with weights_only=False."
        ) from e
    if not isinstance(sd, dict):
        raise TypeError(f"{ckpt_path}: expected a state dict")
    if "state_dict" in sd:  # lightning-wrapped export variant
        sd = sd["state_dict"]
    params, stats = convert_one(state_dict_to_numpy(sd), kind)

    import orbax.checkpoint as ocp

    # training-state wrapper: controller params live under the loss wrapper's
    # 'model' submodule (merge_params is non-strict, so the absent margin head
    # / opt_state don't matter)
    path = out_dir.resolve() / f"epoch={epoch}-step=0"
    payload = {"params": {"model": params},
               "batch_stats": {"model": stats},
               "step": 0, "epoch": epoch}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def synth_to_reproduce(out: Path) -> None:
    """Write a synthetic ``to_reproduce`` tree with the exact production
    layouts (offline drill for this importer + the parity chain)."""
    import torch

    from pets_face_recognition_tpu.utils.torchvision_layouts import (
        fe_controller_sd,
        keypointrcnn_resnet50_fpn_sd,
        maskrcnn_resnet50_fpn_sd,
    )

    rng = np.random.RandomState(0)
    builders = {
        "mask": lambda: maskrcnn_resnet50_fpn_sd(rng),
        "keypoint": lambda: keypointrcnn_resnet50_fpn_sd(rng),
        "fe": lambda: fe_controller_sd(rng),
    }
    for rel, kind, _epoch, _out in MANIFEST:
        dst = out / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        sd = {k: torch.from_numpy(np.asarray(v))
              for k, v in builders[kind]().items()}
        torch.save(sd, dst)
        print(f"synthesized {dst}")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--zip", type=Path, help="path to to_reproduce.zip")
    src.add_argument("--dir", type=Path,
                     help="already-extracted to_reproduce directory")
    src.add_argument("--synth", type=Path, metavar="DIR",
                     help="write synthetic exact-layout ckpts to DIR and exit")
    parser.add_argument("--out", type=Path, default=Path("configs/to_reproduce"),
                        help="orbax output root (entry-point default paths)")
    parser.add_argument("--cpu", action="store_true",
                        help="convert on CPU (layout work only — don't claim "
                             "the TPU; env JAX_PLATFORMS is overridden by the "
                             "axon sitecustomize, hence a flag)")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.synth is not None:
        synth_to_reproduce(args.synth)
        return

    src_dir = args.dir
    if args.zip is not None:
        src_dir = args.zip.parent / "to_reproduce_extracted"
        with zipfile.ZipFile(args.zip) as zf:
            zf.extractall(src_dir)
        # the zip may root the tree at ./ or ./to_reproduce
        if not (src_dir / MANIFEST[0][0]).exists() and (
                src_dir / "to_reproduce" / MANIFEST[0][0]).exists():
            src_dir = src_dir / "to_reproduce"

    for rel, kind, epoch, out_rel in MANIFEST:
        ckpt = src_dir / rel
        if not ckpt.exists():
            print(f"MISSING {ckpt} — skipped")
            continue
        path = import_checkpoint(ckpt, kind, epoch, args.out / out_rel)
        print(f"imported {ckpt} [{kind}] -> {path}")


if __name__ == "__main__":
    main()
