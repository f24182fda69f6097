"""Keypoint R-CNN training smoke: synthetic CAT_DATASET-layout landmarks.

Drives the exact ``main_keypoints.py`` path (reference
``configs/keypoint/keypoints_config.py`` recipe — ResNet-50 FPN keypoint R-CNN,
3 landmarks, 1 detection/img) on generated data:

    python tools/make_smoke_datasets.py            # once
    python main_keypoints.py --config configs/smoke/keypoint_smoke.py
"""

import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(_REPO))

from pets_face_recognition_tpu.config_presets import build_keypoint_config

_root = Path(os.environ.get("PFR_SMOKE_ROOT", "/tmp/pfr_smoke"))
if not (_root / "CAT_DATASET").exists():
    from tools.make_smoke_datasets import make_cat_dataset

    make_cat_dataset(_root)

globals().update(build_keypoint_config(
    data_root=str(_root),
    n_epochs=int(os.environ.get("PFR_SMOKE_EPOCHS", 1)),
    train_batch_size=4,
    test_batch_size=4,
    image_size=(320, 320),
    max_boxes=2,
    num_workers=2,
    output="results_smoke",
))
