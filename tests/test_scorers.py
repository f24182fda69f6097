"""Offline scorers (score_detection / score_landmark) over synthetic GT.

Locks the tsv→literal_eval→greedy-matcher→metric chain end-to-end: the same
flow the TPU drives run (prepare_tables tsv → scorer CLI), with known-answer
inputs. GT pickles follow the parsed Label-Studio schema
(``score_detection.compute_scores_data_25``, ref ``score_detection.py:115-150``):
``[dog_dict, cat_dict]`` of image → list of annotation entries holding
percent-coordinate modes + ``resolution``.
"""

import pickle

import numpy as np
import pandas as pd

import score_detection
import score_landmark

H = W = 320


def _box_entry(box):
    x, y = box[0], box[1]
    w, h = box[2] - box[0], box[3] - box[1]
    return {"Head": {"x": x / W * 100, "y": y / H * 100,
                     "width": w / W * 100, "height": h / H * 100},
            "resolution": (H, W)}


def test_score_detection_perfect_and_missed(tmp_path, capsys):
    gt_boxes = {"a.jpg": [10, 20, 110, 140], "b.jpg": [30, 40, 150, 170]}
    dog = {k: [_box_entry(v)] for k, v in gt_boxes.items()}
    # cat GT exists but has no prediction -> counts as a miss (empty preds)
    cat = {"c.jpg": [_box_entry([5, 5, 50, 50])]}
    anno = tmp_path / "anno.pickle"
    anno.write_bytes(pickle.dumps([dog, cat]))

    df = pd.DataFrame({
        "query": ["a.jpg", "b.jpg"],
        "detections": [str([gt_boxes["a.jpg"]]), str([gt_boxes["b.jpg"]])],
        "scores": [str([0.95]), str([0.9])],
    })
    score_detection.compute_scores_data_25(df, "Head", str(anno))
    out = capsys.readouterr().out
    assert "Dog Head AP at 0.5 = 1.0" in out
    assert "Dog Head IoU = 1.0" in out
    # the missed cat card scores AP 0 at every threshold
    assert "Cat Head AP at 0.5 = 0.0" in out


def test_score_landmark_nme_and_empty_group(tmp_path, capsys):
    pts = np.array([[100.0, 100.0], [200.0, 100.0], [150.0, 160.0]])
    entry = {"resolution": (H, W)}
    for name, p in zip(("Left eye", "Right eye", "Nose"), pts):
        entry[name] = {"x": p[0] / W * 100, "y": p[1] / H * 100}
    anno = tmp_path / "anno.pickle"
    anno.write_bytes(pickle.dumps([{"a.jpg": [entry]}, {}]))

    # predictions offset by exactly 10 px on each eye -> NME = 10 / 100
    preds = pts.copy()
    preds[0, 0] += 10
    preds[1, 0] += 10
    df = pd.DataFrame({
        "query": ["a.jpg"],
        "Left eye": [str(preds[0].astype(int).tolist())],
        "Right eye": [str(preds[1].astype(int).tolist())],
        "Nose": [str(preds[2].astype(int).tolist())],
    })
    score_landmark.compute_scores_data_25(df, str(anno))
    out = capsys.readouterr().out
    assert "Dog NME = 0.1" in out
    # empty cat group: guarded (the reference would crash on np.quantile([]))
    assert "Cat Length = 0" in out
