"""Smoke-config tooling: synthetic datasets in the reference on-disk layouts
load through the real config presets and produce well-formed batches.

These are the configs behind the TPU training smoke runs
(``python main.py --config configs/smoke/fe_smoke.py`` etc).
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pets_face_recognition_tpu.utils import get_dict_wrapper  # noqa: E402


@pytest.fixture(scope="module")
def smoke_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pfr_smoke")
    from tools.make_smoke_datasets import make_cat_dataset, make_fe, make_oxford

    make_fe(root, n_ids=8, n_imgs=4, size=224)
    make_cat_dataset(root, n_imgs=12, size=160)
    make_oxford(root, n_imgs=12, size=160)
    os.environ["PFR_SMOKE_ROOT"] = str(root)
    os.environ["PFR_SMOKE_PAIRS"] = "20"
    yield root
    os.environ.pop("PFR_SMOKE_ROOT", None)
    os.environ.pop("PFR_SMOKE_PAIRS", None)


def test_fe_smoke_config(smoke_root):
    cfg = get_dict_wrapper(REPO / "configs" / "smoke" / "fe_smoke.py")
    batch = next(iter(cfg.train_dataloader()))
    assert batch["x"].shape[1:] == (224, 224, 3)
    assert batch["label"].shape == batch["index"].shape
    name, pg = cfg.pair_generator(0)
    assert len(pg.labels) > 0


def test_keypoint_smoke_config(smoke_root):
    cfg = get_dict_wrapper(REPO / "configs" / "smoke" / "keypoint_smoke.py")
    batch = next(iter(cfg.train_dataloader()))
    assert batch["images"].shape[1:] == (320, 320, 3)
    assert batch["keypoints"].shape[-2:] == (3, 3)
    v = np.asarray(batch["valid"])
    assert v.any(), "at least one valid box per batch expected"


def test_mask_smoke_config(smoke_root):
    cfg = get_dict_wrapper(REPO / "configs" / "smoke" / "mask_smoke.py")
    batch = next(iter(cfg.train_dataloader()))
    assert batch["masks"].shape[2:] == (320, 320)
    m = np.asarray(batch["masks"])[np.asarray(batch["valid"])]
    assert m.max() > 0, "foreground pixels expected in valid masks"
