"""Evaluate the trained dog-head FE (reference ``eval_fe_dog_head_sgd.py``)."""

import argparse
from pathlib import Path

from eval_fe_cat_head_sgd import evaluate

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/to_reproduce/dog_fe/fe_dogs_config.py")
    parser.add_argument("--ckpt", default="configs/to_reproduce/dog_fe/checkpoints")
    args = parser.parse_args()
    ckpt = Path(args.ckpt)
    if ckpt.is_dir() and not (ckpt / "_CHECKPOINT_METADATA").exists():
        from pets_face_recognition_tpu.engine import latest_checkpoint

        ckpt = latest_checkpoint(ckpt) or ckpt
    evaluate(args.config, str(ckpt))
