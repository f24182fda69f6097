"""FE training smoke: synthetic identity cards, ResNet-50 -> 512-d ArcFace.

Drives the exact ``main.py`` path (reference ``configs/cat_fe/cat_fe_head.py``
recipe) on generated data so training can be exercised end-to-end on TPU in
an image without the real corpora:

    python tools/make_smoke_datasets.py            # once
    python main.py --config configs/smoke/fe_smoke.py
"""

import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(_REPO))

from pets_face_recognition_tpu.config_presets import build_fe_config

_root = Path(os.environ.get("PFR_SMOKE_ROOT", "/tmp/pfr_smoke"))
if not (_root / "smoke_fe_cats").exists():
    from tools.make_smoke_datasets import make_fe

    make_fe(_root)

globals().update(build_fe_config(
    dataset_dir=str(_root / "smoke_fe_cats"),
    n_epochs=int(os.environ.get("PFR_SMOKE_EPOCHS", 2)),
    train_batch_size=16,
    test_batch_size=8,
    num_workers=2,
    experiment_name="Smoke",
    run_name="ResNet50 FE smoke",
    output="results_smoke",
    n_pairs=int(os.environ.get("PFR_SMOKE_PAIRS", 200)),
))
