"""Offline detection scorer against Label-Studio ground truth.

Behavioral rebuild of ``/root/reference/score_detection.py``: reads a prediction
``.tsv`` (columns ``query, detections, scores``), matches greedily against the
``data_25_anno.pickle`` annotations at IoU thresholds {0.5, 0.7, 0.75, 0.9}, and
prints AP per species/mode plus the reference's ``IoU`` line. The tsv interface
is the behavioral test surface of the whole stack (SURVEY.md §4.3), so the
matching code reproduces the reference algorithm exactly — including visiting
predictions in stored order, consuming matched GT boxes, and the reference's
``ious``-rebinding quirk (see ``evaluate``); bit-parity is pinned against the
real reference code + real ``data_25_anno.pickle`` in
``tests/test_scorer_reference_parity.py``.

CLI: ``python score_detection.py --path detected_head.tsv --ds data_25 --mode Head``
(argparse instead of ``fire``, which is not available in this image; positional
args work the same).
"""

import argparse
import json
import pickle
from ast import literal_eval
from contextlib import suppress
from pathlib import Path

import numpy as np
import pandas as pd
from PIL import Image
from sklearn.metrics import average_precision_score


def parse_labeled_studio(p: Path, p2: Path,
                         out: str = "data_25_anno.pickle") -> None:
    """Parse Label-Studio exports into the annotation pickle
    (ref ``score_detection.py:15-39``)."""
    processed = [{}, {}]
    img_d_p = {
        j.name: j
        for i in p2.resolve().iterdir()
        for k in i.iterdir()
        for j in k.iterdir()
    }
    for case in ("old", "new"):
        for ids in (p / case).iterdir():
            for js in ids.iterdir():
                t = json.loads(js.read_text())
                animal_type = ["dog", "cat"].index(js.name[:-5])
                for entry in t:
                    img_name = "-".join(entry["file_upload"].split("-")[1:])
                    tmp = []
                    for ann in entry["annotations"]:
                        tmp.append({})
                        for j in ann["result"]:
                            if "keypointlabels" in j["value"]:
                                tmp[-1][j["value"]["keypointlabels"][0]] = j["value"]
                            else:
                                tmp[-1][j["value"]["rectanglelabels"][0]] = j["value"]
                        tmp[-1]["resolution"] = np.array(
                            Image.open(img_d_p[img_name]).convert("RGB")
                        ).shape[:-1]
                    processed[animal_type][img_name] = tmp
    with open(out, "wb") as f:
        pickle.dump(processed, f)


def intersection_over_union(dt_bbox, gt_bbox):
    x0 = max(dt_bbox[0], gt_bbox[0]); x1 = min(dt_bbox[2], gt_bbox[2])
    y0 = max(dt_bbox[1], gt_bbox[1]); y1 = min(dt_bbox[3], gt_bbox[3])
    inter = (x1 - x0) * (y1 - y0)
    union = (
        (dt_bbox[2] - dt_bbox[0]) * (dt_bbox[3] - dt_bbox[1])
        + (gt_bbox[2] - gt_bbox[0]) * (gt_bbox[3] - gt_bbox[1])
        - inter
    )
    return inter / union


def evaluate(preds, scores, g_t):
    """Greedy AP at fixed thresholds + the reference's ``IoU`` metric
    (ref ``score_detection.py:61-102``), reproduced exactly.

    NOTE on the ``IoU`` value (behavioral quirk, kept for tsv-contract
    parity — verified bit-identical against the reference code on the real
    ``data_25_anno.pickle`` in ``tests/test_scorer_reference_parity.py``):
    the reference initializes an ``ious = []`` accumulator but then REBINDS
    ``ious`` to each prediction's per-GT IoU list inside the loop (ref
    ``score_detection.py:63,76,86,89``), so the thr=0.5 appends land on
    per-prediction lists that are immediately discarded. The printed ``IoU``
    is therefore ``mean`` of the LAST processed prediction's IoUs against its
    image's remaining GT boxes during the LAST (thr=0.9) pass — effectively
    the last image's IoU, ``nan`` when there are no predictions at all.
    """
    metrics = {}
    ious = []
    for thr in (0.5, 0.7, 0.75, 0.9):
        results = []
        remaining = [list(map(list, g)) for g in g_t]
        for j in range(len(preds)):
            for a in range(len(preds[j])):
                dt = preds[j][a]
                results.append({"score": scores[j][a]})
                ious = [
                    intersection_over_union(remaining[j][b], dt)
                    for b in range(len(remaining[j]))
                ]
                if ious:
                    max_gt_id = int(np.argmax(ious))
                    max_iou = ious[max_gt_id]
                else:
                    max_gt_id, max_iou = -1, -1
                if max_gt_id >= 0 and max_iou >= thr:
                    results[-1]["TP"] = 1
                    del remaining[j][max_gt_id]
                    if thr == 0.5:
                        ious.append(max_iou)
                else:
                    results[-1]["TP"] = 0
                    if thr == 0.5:
                        ious.append(0)
        results = sorted(results, key=lambda k: k["score"], reverse=True)
        flags = [r["TP"] for r in results]
        svals = [r["score"] for r in results]
        if not flags:
            ap = 0.0
        elif all(f == flags[0] for f in flags):
            # sklearn returns exactly float(flags[0]) here too; special-cased
            # only to avoid its single-class warning spam
            ap = float(flags[0])
        else:
            ap = float(average_precision_score(flags, svals))
        metrics[f"AP at {thr}"] = ap
    metrics["IoU"] = float(np.mean(ious)) if ious else float("nan")
    return metrics


def compute_scores_data_25(df, mode, anno_path="data_25_anno.pickle"):
    with open(anno_path, "rb") as f:
        db = pickle.load(f)

    cut_db = [{}, {}]
    for i in range(len(db)):
        for k, v in db[i].items():
            detections = []
            with suppress(KeyError):
                for j in range(len(v)):
                    t = v[j][mode]
                    h, w = v[j]["resolution"]
                    box = [t["x"], t["y"], t["x"] + t["width"],
                           t["y"] + t["height"]]
                    box = [box[0] * w / 100, box[1] * h / 100,
                           box[2] * w / 100, box[3] * h / 100]
                    detections.append(np.round(box).astype(int).tolist())
            if detections:
                cut_db[i][k] = detections

    d = {row["query"]: row for _, row in df.iterrows()}
    for tag, i in zip(("Dog", "Cat"), range(len(cut_db))):
        preds, g_t, scores = [], [], []
        for k, true_detections in cut_db[i].items():
            g_t.append(true_detections)
            if k in d:
                preds.append(literal_eval(d[k]["detections"]))
                scores.append(literal_eval(d[k]["scores"]))
            else:
                preds.append([])
                scores.append([])
        metrics = evaluate(preds, scores, g_t)
        print(*[f"{tag} {mode} {k} = {v}" for k, v in metrics.items()], sep="\n")
    print()


available_ds = {"data_25": compute_scores_data_25}


def main(path: str, ds: str, mode: str, anno: str = "data_25_anno.pickle"):
    path = Path(path)
    assert path.exists(), "Incorrect path to the .tsv file"
    assert ds in available_ds, f"Invalid ds. Choose from {tuple(available_ds)}"
    assert mode in ("Head", "Animal"), "Invalid mode: choose Head or Animal"
    df = pd.read_csv(path, sep="\t")
    assert all(c in df.columns for c in ("query", "detections", "scores")), (
        "Incorrectly formatted .tsv file"
    )
    available_ds[ds](df, mode, anno)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("path")
    parser.add_argument("ds")
    parser.add_argument("mode")
    parser.add_argument("--anno", default="data_25_anno.pickle")
    a = parser.parse_args()
    main(a.path, a.ds, a.mode, a.anno)
