"""Evaluate the trained cat-head FE against the README table numbers.

Reference ``eval_fe_cat_head_sgd.py``: load the frozen config + checkpoint (the
shipped ckpts omit the ``add_margin`` head, hence the non-strict merge) and run
``trainer.test`` → ROC AUC / Accuracy / Recall@{10,100}.
"""

import argparse
from pathlib import Path

import jax

from pets_face_recognition_tpu.engine import (
    Controller,
    Trainer,
    load_checkpoint,
    merge_params,
)
from pets_face_recognition_tpu.parallel import create_mesh
from pets_face_recognition_tpu.utils import get_config

DEFAULT_CONFIG = "configs/to_reproduce/cat_fe/cat_fe_head.py"
DEFAULT_CKPT = "configs/to_reproduce/cat_fe/checkpoints"


def evaluate(config_path: str, ckpt_path: str):
    config = get_config(config_path)
    mesh = create_mesh()
    controller = Controller(config, mesh=mesh)
    trainer = Trainer(config=config, mesh=mesh, enable_checkpointing=False,
                      default_root_dir=config.get("output", "."))

    first_batch = next(iter(controller.val_dataloader()))
    state = controller.init_state(jax.random.PRNGKey(0), first_batch)
    payload = load_checkpoint(ckpt_path)
    # non-strict merge: checkpoint may omit the margin head (download_models.py:8-9)
    state = state.replace(
        params=merge_params(state.params, payload["params"]),
        batch_stats=merge_params(state.batch_stats,
                                 payload.get("batch_stats", {})),
    )
    return trainer.test(controller, state)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=DEFAULT_CONFIG)
    parser.add_argument("--ckpt", default=DEFAULT_CKPT)
    args = parser.parse_args()
    ckpt = Path(args.ckpt)
    if ckpt.is_dir() and not (ckpt / "_CHECKPOINT_METADATA").exists():
        from pets_face_recognition_tpu.engine import latest_checkpoint

        ckpt = latest_checkpoint(ckpt) or ckpt
    evaluate(args.config, str(ckpt))
