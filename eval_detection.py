"""Evaluate the trained Mask R-CNN body detector (reference ``eval_detection.py``:
frozen mask config + ``epoch=64`` checkpoint → ``trainer.test`` AP/IoU table)."""

import argparse
from pathlib import Path

import jax

from pets_face_recognition_tpu.engine import (
    DetectionController,
    Trainer,
    latest_checkpoint,
    load_checkpoint,
    merge_params,
)
from pets_face_recognition_tpu.parallel import create_mesh
from pets_face_recognition_tpu.utils import get_config


def evaluate(config_path: str, ckpt_path: str, controller_cls=DetectionController):
    config = get_config(config_path)
    mesh = create_mesh()
    controller = controller_cls(config, mesh=mesh)
    trainer = Trainer(config=config, mesh=mesh, enable_checkpointing=False,
                      default_root_dir=config.get("output", "."))
    first_batch = next(iter(controller.val_dataloader()))
    state = controller.init_state(jax.random.PRNGKey(0), first_batch)
    payload = load_checkpoint(ckpt_path)
    state = state.replace(
        params=merge_params(state.params, payload["params"]),
        batch_stats=merge_params(state.batch_stats,
                                 payload.get("batch_stats", {})),
    )
    return trainer.test(controller, state)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/mask/mask_rcnn_config.py")
    parser.add_argument("--ckpt", default="configs/to_reproduce/mask/checkpoints")
    args = parser.parse_args()
    ckpt = Path(args.ckpt)
    if ckpt.is_dir() and not (ckpt / "_CHECKPOINT_METADATA").exists():
        ckpt = latest_checkpoint(ckpt) or ckpt
    evaluate(args.config, str(ckpt))
