"""Evaluate the trained Keypoint R-CNN head+landmark detector (reference
``eval_landmark.py``: frozen keypoint config + ``epoch=14`` checkpoint →
``trainer.test`` AP/IoU/NME table)."""

import argparse
from pathlib import Path

from pets_face_recognition_tpu.engine import KeyPointsController, latest_checkpoint

from eval_detection import evaluate

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/keypoint/keypoints_config.py")
    parser.add_argument("--ckpt",
                        default="configs/to_reproduce/keypoint/checkpoints")
    args = parser.parse_args()
    ckpt = Path(args.ckpt)
    if ckpt.is_dir() and not (ckpt / "_CHECKPOINT_METADATA").exists():
        ckpt = latest_checkpoint(ckpt) or ckpt
    evaluate(args.config, str(ckpt), controller_cls=KeyPointsController)
