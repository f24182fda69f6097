"""Differential parity: our scorers vs the REAL reference scorer code.

The reference scorers (`/root/reference/score_detection.py`,
`/root/reference/score_landmark.py`) are pure pandas/numpy/sklearn and run in
this image, and the REAL Label-Studio ground truth (`data_25_anno.pickle`,
382 KB, 2×~250 images with Head/Animal boxes + 6 keypoints each) ships with
the reference. So the strongest possible contract test is available without
any model weights: feed byte-identical prediction tsvs over the real GT to
both implementations and require identical printed metrics.

This pins every quirk of the matcher on real data — greedy first-max GT
consumption, the unclamped IoU formula on disjoint boxes, the thr-sweep
deepcopy semantics, the ``ious``-rebinding bug behind the reported ``IoU``
line (ref ``score_detection.py:63,76,86,89``), NME's nose-exclusion and
eye-distance normalization, and the exact percent→pixel rounding of the GT
parse.

The reference imports ``fire`` (absent here); it is stubbed before the module
executes — only ``fire.Fire`` at ``__main__`` scope uses it, which never runs
under importlib.
"""

import importlib.util
import io
import math
import shutil
import sys
import types
from contextlib import redirect_stdout
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import score_detection
import score_landmark

REF = Path("/root/reference")
REAL_ANNO = REF / "data_25_anno.pickle"

pytestmark = pytest.mark.skipif(
    not REAL_ANNO.exists(), reason="reference data_25_anno.pickle not present"
)


def _load_ref_module(name: str):
    """Import a reference script as a module with ``fire`` stubbed out."""
    if "fire" not in sys.modules:
        fire = types.ModuleType("fire")
        fire.Fire = lambda *a, **k: None
        sys.modules["fire"] = fire
    spec = importlib.util.spec_from_file_location(f"ref_{name}", REF / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _parse_metrics(out: str):
    """'Dog Head AP at 0.5 = 0.91' lines -> {label: float} (nan-safe)."""
    parsed = {}
    for line in out.splitlines():
        if " = " not in line:
            continue
        label, val = line.rsplit(" = ", 1)
        parsed[label] = float(val)
    return parsed


def _assert_same_metrics(ref_out: str, our_out: str):
    ref_m, our_m = _parse_metrics(ref_out), _parse_metrics(our_out)
    assert ref_m.keys() == our_m.keys(), (ref_m.keys(), our_m.keys())
    for k, rv in ref_m.items():
        ov = our_m[k]
        if math.isnan(rv):
            assert math.isnan(ov), f"{k}: ref=nan ours={ov}"
        else:
            assert rv == ov, f"{k}: ref={rv} ours={ov}"
    assert ref_m, "no metrics parsed — scorer printed nothing"


def _real_gt_boxes(mode: str):
    """Replicates the scorers' GT cut (percent→pixel, rounded int boxes)."""
    import pickle

    db = pickle.loads(REAL_ANNO.read_bytes())
    cut = [{}, {}]
    for i, species in enumerate(db):
        for k, v in species.items():
            boxes = []
            try:
                for entry in v:
                    t = entry[mode]
                    h, w = entry["resolution"]
                    box = [t["x"], t["y"], t["x"] + t["width"], t["y"] + t["height"]]
                    box = [box[0] * w / 100, box[1] * h / 100,
                           box[2] * w / 100, box[3] * h / 100]
                    boxes.append(np.round(box).astype(int).tolist())
            except KeyError:
                continue
            if boxes:
                cut[i][k] = boxes
    return cut


def _synth_detection_tsv(path: Path, mode: str, seed: int):
    """Noisy predictions over the REAL GT: perturbed TPs, random FPs,
    dropped queries — so every matcher branch fires."""
    rng = np.random.RandomState(seed)
    cut = _real_gt_boxes(mode)
    rows = []
    for species in cut:
        for k, boxes in species.items():
            r = rng.rand()
            if r < 0.15:
                continue  # missing query -> scorer counts a miss
            dets, scores = [], []
            for b in boxes:
                jitter = rng.randint(-20, 21, size=4)
                dets.append([int(b[0] + jitter[0]), int(b[1] + jitter[1]),
                             int(b[2] + jitter[2]), int(b[3] + jitter[3])])
                scores.append(round(float(rng.rand()), 6))
            if rng.rand() < 0.3:  # far-away false positive
                x0, y0 = rng.randint(0, 50, size=2)
                dets.append([int(x0), int(y0), int(x0 + 30), int(y0 + 40)])
                scores.append(round(float(rng.rand()), 6))
            rows.append({"query": k, "detections": str(dets),
                         "scores": str(scores)})
    assert len(rows) > 100
    pd.DataFrame(rows).to_csv(path, sep="\t", index=False)


@pytest.mark.parametrize("mode,seed", [("Head", 0), ("Animal", 1), ("Head", 2)])
def test_score_detection_matches_reference(tmp_path, monkeypatch, mode, seed):
    tsv = tmp_path / "preds.tsv"
    _synth_detection_tsv(tsv, mode, seed)
    shutil.copy(REAL_ANNO, tmp_path / "data_25_anno.pickle")
    monkeypatch.chdir(tmp_path)  # the reference reads the pickle from CWD

    ref = _load_ref_module("score_detection")
    buf_ref, buf_ours = io.StringIO(), io.StringIO()
    with redirect_stdout(buf_ref):
        ref.main(str(tsv), "data_25", mode)
    with redirect_stdout(buf_ours):
        score_detection.main(str(tsv), "data_25", mode)
    _assert_same_metrics(buf_ref.getvalue(), buf_ours.getvalue())


def test_score_detection_no_predictions_matches_reference(tmp_path, monkeypatch):
    """All queries missing: AP 0 everywhere and the quirky IoU = nan."""
    tsv = tmp_path / "preds.tsv"
    pd.DataFrame([{"query": "nonexistent.jpg", "detections": "[]",
                   "scores": "[]"}]).to_csv(tsv, sep="\t", index=False)
    shutil.copy(REAL_ANNO, tmp_path / "data_25_anno.pickle")
    monkeypatch.chdir(tmp_path)

    ref = _load_ref_module("score_detection")
    buf_ref, buf_ours = io.StringIO(), io.StringIO()
    with np.errstate(invalid="ignore"), redirect_stdout(buf_ref):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ref.main(str(tsv), "data_25", "Head")
    with redirect_stdout(buf_ours):
        score_detection.main(str(tsv), "data_25", "Head")
    _assert_same_metrics(buf_ref.getvalue(), buf_ours.getvalue())
    assert math.isnan(_parse_metrics(buf_ours.getvalue())["Dog Head IoU"])


def _synth_landmark_tsv(path: Path, seed: int):
    import pickle

    rng = np.random.RandomState(seed)
    db = pickle.loads(REAL_ANNO.read_bytes())
    rows = []
    for species in db:
        for k, v in species.items():
            try:
                entry = v[0]
                h, w = entry["resolution"]
                pts = {}
                for name in ("Left eye", "Right eye", "Nose"):
                    t = entry[name]
                    px = np.round([t["x"], t["y"]]).astype(int) \
                        * np.asarray([w, h]) / 100
                    pts[name] = px
            except KeyError:
                continue
            if rng.rand() < 0.2:
                continue  # dropped query (suppress(KeyError) path)
            row = {"query": k}
            for name, p in pts.items():
                noisy = p + rng.randn(2) * 5.0
                row[name] = str([round(float(noisy[0]), 3),
                                 round(float(noisy[1]), 3)])
            rows.append(row)
    assert len(rows) > 100
    pd.DataFrame(rows).to_csv(path, sep="\t", index=False)


@pytest.mark.parametrize("seed", [0, 3])
def test_score_landmark_matches_reference(tmp_path, monkeypatch, seed):
    tsv = tmp_path / "landmarks.tsv"
    _synth_landmark_tsv(tsv, seed)
    shutil.copy(REAL_ANNO, tmp_path / "data_25_anno.pickle")
    monkeypatch.chdir(tmp_path)

    ref = _load_ref_module("score_landmark")
    buf_ref, buf_ours = io.StringIO(), io.StringIO()
    with redirect_stdout(buf_ref):
        ref.main(str(tsv), "data_25")
    with redirect_stdout(buf_ours):
        score_landmark.main(str(tsv), "data_25")
    _assert_same_metrics(buf_ref.getvalue(), buf_ours.getvalue())
