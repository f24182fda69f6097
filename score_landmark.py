"""Offline landmark (NME) scorer against Label-Studio ground truth.

Behavioral rebuild of ``/root/reference/score_landmark.py``: reads a landmark
``.tsv`` (columns ``query, Left eye, Right eye, Nose``), computes per-image NME
normalized by the GT inter-eye distance, and prints mean / trimmed mean / median /
quartiles per species. Reproduces the reference's quirks: only the first
annotation per image is used, and the NME averages the **eye** landmarks only
(``preds[i][:-1]`` drops the nose, ref ``score_landmark.py:41-60``).
"""

import argparse
import pickle
from ast import literal_eval
from contextlib import suppress
from pathlib import Path

import numpy as np
import pandas as pd

from score_detection import parse_labeled_studio  # same parser (ref duplicates it)

__all__ = ["parse_labeled_studio", "evaluate", "compute_scores_data_25", "main"]


def evaluate(preds, g_t, names):
    metrics = {}
    to_average = []
    for i in range(len(g_t)):
        d = ((g_t[i][0] - g_t[i][1]) ** 2).sum() ** 0.5
        nme = ((preds[i][:-1] - g_t[i][:-1]) ** 2).sum(axis=1) ** 0.5 / d
        to_average.extend(nme)
    to_average = np.asarray(to_average)
    metrics["Length"] = len(to_average)
    if not len(to_average):
        # guard: a species group with no matched predictions (possible on
        # smoke corpora) — the reference crashes here (np.quantile of an
        # empty array, ref score_landmark.py:41-60); real data_25 always has
        # both groups populated, so the defined surface is unchanged
        return metrics
    metrics["NME"] = float(np.mean(to_average))
    lo, hi = np.quantile(to_average, 0.05), np.quantile(to_average, 0.95)
    metrics["NME 0.05 0.95"] = float(
        to_average[(to_average > lo) & (to_average < hi)].mean()
    )
    metrics["NME median"] = float(np.median(to_average))
    metrics["NME 0.75"] = float(np.quantile(to_average, 0.75))
    metrics["NME 0.25"] = float(np.quantile(to_average, 0.25))
    return metrics


def compute_scores_data_25(df, anno_path="data_25_anno.pickle"):
    with open(anno_path, "rb") as f:
        db = pickle.load(f)

    cut_db = [{}, {}]
    for i in range(len(db)):
        for k, v in db[i].items():
            detections = []
            with suppress(KeyError):
                for j in range(len(v)):
                    pts = []
                    for mode in ("Left eye", "Right eye", "Nose"):
                        t = v[j][mode]
                        pts.append(np.round([t["x"], t["y"]]).astype(int))
                    h, w = v[j]["resolution"]
                    detections.append(
                        np.array(pts) * np.asarray([w, h])[None] / 100
                    )
            if detections:
                cut_db[i][k] = detections[0]

    d = {row["query"]: row for _, row in df.iterrows()}
    for tag, i in zip(("Dog", "Cat"), range(len(cut_db))):
        preds, g_t, names = [], [], []
        for k, true_detections in cut_db[i].items():
            with suppress(KeyError):
                preds.append(np.array((
                    literal_eval(d[k]["Left eye"]),
                    literal_eval(d[k]["Right eye"]),
                    literal_eval(d[k]["Nose"]),
                )))
                g_t.append(true_detections)
                names.append(k)
        metrics = evaluate(preds, g_t, names)
        print(*[f"{tag} {k} = {v}" for k, v in metrics.items()], sep="\n")
    print()


available_ds = {"data_25": compute_scores_data_25}


def main(path: str, ds: str, anno: str = "data_25_anno.pickle"):
    path = Path(path)
    assert path.exists(), "Incorrect path to the .tsv file"
    assert ds in available_ds, f"Invalid ds. Choose from {tuple(available_ds)}"
    df = pd.read_csv(path, sep="\t")
    assert all(c in df.columns for c in ("query", "Left eye", "Right eye", "Nose")), (
        "Incorrectly formatted .tsv file"
    )
    available_ds[ds](df, anno)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("path")
    parser.add_argument("ds")
    parser.add_argument("--anno", default="data_25_anno.pickle")
    a = parser.parse_args()
    main(a.path, a.ds, a.anno)
