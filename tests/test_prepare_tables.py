"""prepare_tables emit format vs the scorer's parse contract.

``score_detection.py`` re-reads the prediction tsvs with ``ast.literal_eval``
(reference ``score_detection.py:115-150``), so every ``detections``/``scores``
cell must be bare-python-literal text. numpy 2.x scalar reprs
(``np.float32(0.67)``) silently break that contract — regression-pinned here.
"""

from ast import literal_eval
from pathlib import Path

import numpy as np
import pandas as pd
from PIL import Image

from prepare_tables import prepare_table
from pets_face_recognition_tpu.preprocessor import Preproc3, Preproc6


class _StubHeadBox(Preproc6):
    def __init__(self):
        self.return_for_metrics = False

    def __call__(self, image):
        # scorer contract: bbox int array + np.float32 scores (the emit path
        # must convert both to plain literals)
        return np.array([31, 32, 241, 275]), np.array([0.6743], np.float32)


class _StubLandmarks(Preproc3):
    def __init__(self):
        self.return_for_metrics = False

    def __call__(self, image):
        return np.array([[138, 212], [243, 212], [191, 273]])


def _data_root(tmp_path: Path) -> Path:
    card = tmp_path / "data" / "part1" / "card_000"
    card.mkdir(parents=True)
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(card / "1.jpg")
    return tmp_path / "data"


def test_detection_tsv_cells_are_literal_evalable(tmp_path):
    root = _data_root(tmp_path)
    out = tmp_path / "detected_head.tsv"
    prepare_table(_StubHeadBox(), root, str(out))
    df = pd.read_csv(out, sep="\t")
    assert len(df) == 1
    boxes = literal_eval(df.iloc[0]["detections"])
    scores = literal_eval(df.iloc[0]["scores"])
    assert boxes == [[31, 32, 241, 275]]
    assert abs(scores[0] - 0.6743) < 1e-6


def test_landmark_tsv_cells_are_literal_evalable(tmp_path):
    root = _data_root(tmp_path)
    out = tmp_path / "landmark.tsv"
    prepare_table(_StubLandmarks(), root, str(out))
    df = pd.read_csv(out, sep="\t")
    assert len(df) == 1
    assert literal_eval(df.iloc[0]["Left eye"]) == [138, 212]
    assert literal_eval(df.iloc[0]["Nose"]) == [191, 273]
