"""Mask R-CNN training smoke: synthetic Oxford-IIIT-Pet-layout data.

Drives the exact ``main_detection.py`` path (reference
``configs/mask/mask_rcnn_config.py`` recipe — ResNet-50 FPN Mask R-CNN with
trimap-derived body boxes) on generated data:

    python tools/make_smoke_datasets.py            # once
    python main_detection.py --config configs/smoke/mask_smoke.py
"""

import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(_REPO))

from pets_face_recognition_tpu.config_presets import build_mask_config

_root = Path(os.environ.get("PFR_SMOKE_ROOT", "/tmp/pfr_smoke"))
if not (_root / "oxford-iiit-pet").exists():
    from tools.make_smoke_datasets import make_oxford

    make_oxford(_root)

globals().update(build_mask_config(
    data_root=str(_root),
    n_epochs=int(os.environ.get("PFR_SMOKE_EPOCHS", 1)),
    train_batch_size=4,
    test_batch_size=4,
    image_size=(320, 320),
    max_boxes=2,
    num_workers=2,
    output="results_smoke",
))
