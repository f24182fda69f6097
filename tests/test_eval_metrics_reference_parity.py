"""Differential parity: our detection/keypoint evaluators vs the REAL reference code.

The reference's evaluation stack (`/root/reference/engine/detector_controller.py:124-218`,
`/root/reference/engine/keypoints_controller.py:138-230`) is what produced every
detection/landmark number in the README tables (AP50/70/90, Mean/Median IoU,
Masks Mean IoU, MAE/MSE/NMAE/NME).  It is pure numpy/sklearn inside a
LightningModule shell, so — like the scorer parity tests — the strongest
contract test runs the REAL reference `_evaluate` (with `pytorch_lightning` and
`pipe` stubbed, and a fake `self` supplying the two static helpers) against our
`engine.detection_metrics.detection_metrics` on identical random predictions,
and requires the printed metrics to match to float32 print precision (the
reference accumulates e.g. its IoU list in float32 — ``np.mean`` over a list of
``np.float32`` scalars stays float32 — while we accumulate in float64, so
bit-equality is bounded by the reference's own precision, rtol ~1e-7).

Scope note: the reference matcher has two index-misalignment quirks when images
carry *mixed* GT labels (it deletes matched rows from ``target[j]`` but never
from ``target_labels[j]``, and it uses the label-filtered candidate index as an
unfiltered ``np.delete`` index — ``detector_controller.py:175-186``).  Every
production config is single-foreground-class (``num_classes=2``; labels are
identically 1 after the +1 shift, ``detector_controller.py:22-27``), where both
quirks are unreachable, so this suite pins the production regime: uniform
labels, mixed TP/FP flags at every threshold.
"""

import importlib.util
import io
import re
import sys
import types
from contextlib import redirect_stdout
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pets_face_recognition_tpu.engine.detection_metrics import detection_metrics

REF = Path("/root/reference")


# ---------------------------------------------------------------------------
# reference import machinery (stub pytorch_lightning / pipe / mlflow shells)
# ---------------------------------------------------------------------------

def _install_stubs(monkeypatch):
    pl = types.ModuleType("pytorch_lightning")
    pl.LightningModule = object
    loggers = types.ModuleType("pytorch_lightning.loggers")
    loggers.MLFlowLogger = object
    utilities = types.ModuleType("pytorch_lightning.utilities")
    ptypes = types.ModuleType("pytorch_lightning.utilities.types")
    for name in ("STEP_OUTPUT", "EPOCH_OUTPUT", "TRAIN_DATALOADERS", "EVAL_DATALOADERS"):
        setattr(ptypes, name, object)
    pl.loggers = loggers
    utilities.types = ptypes
    monkeypatch.setitem(sys.modules, "pytorch_lightning", pl)
    monkeypatch.setitem(sys.modules, "pytorch_lightning.loggers", loggers)
    monkeypatch.setitem(sys.modules, "pytorch_lightning.utilities", utilities)
    monkeypatch.setitem(sys.modules, "pytorch_lightning.utilities.types", ptypes)

    # `from pipe import where`: `range(n) | where(f)` filters the iterable.
    pipe_mod = types.ModuleType("pipe")

    class _Where:
        def __init__(self, f):
            self.f = f

        def __ror__(self, iterable):
            return (x for x in iterable if self.f(x))

    pipe_mod.where = _Where
    monkeypatch.setitem(sys.modules, "pipe", pipe_mod)


def _load_ref_module(monkeypatch, relpath, name):
    _install_stubs(monkeypatch)
    spec = importlib.util.spec_from_file_location(name, REF / relpath)
    mod = importlib.util.module_from_spec(spec)
    monkeypatch.setitem(sys.modules, name, mod)
    spec.loader.exec_module(mod)
    return mod


def _fake_self(ref_cls):
    return types.SimpleNamespace(
        intersection_over_union=ref_cls.intersection_over_union,
        av=getattr(ref_cls, "av", None),
        logger=None,
        current_epoch=0,
    )


def _parse_printed(text):
    """Parse `'<split> <Metric Name> <value>'` lines into {split: {metric: float}}."""
    out = {"train": {}, "val": {}}
    for line in text.splitlines():
        m = re.match(r"^(train|val) (.+) ((?:[-+0-9.eE]+|nan))$", line.strip())
        if m:
            out[m.group(1)][m.group(2)] = float(m.group(3))
    return out


# ---------------------------------------------------------------------------
# shared random data (score-sorted per image, uniform labels, mixed TP/FP)
# ---------------------------------------------------------------------------

def _rand_box(rng, lo=0.0, hi=300.0):
    x0, y0 = rng.uniform(lo, hi - 40, 2)
    w, h = rng.uniform(8, 40, 2)
    return np.array([x0, y0, x0 + w, y0 + h], np.float32)


def _jitter(rng, box, eps):
    return (box + rng.uniform(-eps, eps, 4).astype(np.float32)).astype(np.float32)


def _make_images(rng, n_images, with_masks=False, with_keypoints=False):
    """Per-image (pred, true) numpy dicts: every image has 1-3 GTs; predictions
    mix near-copies of GT (TPs across thresholds), loose overlaps (TP only at
    low thr) and far boxes (FPs); one image has no predictions at all.

    With keypoints, every non-empty image gets >= n_gt predictions — the
    reference NME loop slices predictions to the GT count and broadcasts
    (`keypoints_controller.py:208`), so it *crashes* on fewer preds than GTs;
    production (1 detection, 1 GT) always satisfies this."""
    preds, trues = [], []
    for j in range(n_images):
        n_gt = int(rng.integers(1, 4))
        gt = np.stack([_rand_box(rng) for _ in range(n_gt)])
        boxes, scores = [], []
        for b in range(n_gt):
            r = rng.uniform()
            if r < 0.45 or with_keypoints:
                boxes.append(_jitter(rng, gt[b], 0.5))   # tight match
            elif r < 0.75:
                boxes.append(_jitter(rng, gt[b], 6.0))   # loose match
            if rng.uniform() < 0.4:
                boxes.append(_rand_box(rng))             # far FP
        if j == n_images - 1:
            boxes = []                                    # empty-pred image
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        scores = np.sort(rng.uniform(0.3, 1.0, len(boxes)).astype(np.float32))[::-1].copy()
        pred = {
            "boxes": boxes,
            "scores": scores,
            "labels": np.ones(len(boxes), np.int64),
        }
        true = {"boxes": gt, "labels": np.ones(n_gt, np.int64)}
        if with_masks:
            pred["masks"] = rng.uniform(0, 1, (n_gt, 32, 32)).astype(np.float32)
            true["masks"] = (rng.uniform(0, 1, (n_gt, 32, 32)) > 0.6).astype(np.uint8)
        if with_keypoints:
            pred["keypoints"] = np.concatenate(
                [rng.uniform(0, 300, (len(boxes), 3, 2)), np.ones((len(boxes), 3, 1))],
                axis=-1).astype(np.float32)
            true["keypoints"] = np.concatenate(
                [rng.uniform(0, 300, (n_gt, 3, 2)), np.ones((n_gt, 3, 1))],
                axis=-1).astype(np.float32)
        preds.append(pred)
        trues.append(true)
    return preds, trues


def _to_ref_outputs(preds, trues, batch=4):
    """Wrap per-image numpy dicts into the reference's EPOCH_OUTPUT nesting:
    outputs[split] = [ {'pred': [torch dicts...], 'true': [torch dicts...]} ]."""
    batches = []
    for s in range(0, len(preds), batch):
        batches.append({
            "pred": [{k: torch.from_numpy(np.asarray(v)) for k, v in p.items()}
                     for p in preds[s:s + batch]],
            "true": [{k: torch.from_numpy(np.asarray(v)) for k, v in t.items()}
                     for t in trues[s:s + batch]],
        })
    return batches


def _run_ref_evaluate(ref_cls, train, val):
    outputs = [_to_ref_outputs(*train), _to_ref_outputs(*val)]
    buf = io.StringIO()
    with redirect_stdout(buf):
        ref_cls._evaluate(_fake_self(ref_cls), outputs)
    return _parse_printed(buf.getvalue())


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_detection_evaluate_parity(monkeypatch):
    ref = _load_ref_module(monkeypatch, "engine/detector_controller.py",
                           "ref_detector_controller")
    rng = np.random.default_rng(20260819)
    train = _make_images(rng, 9, with_masks=True)
    val = _make_images(rng, 7, with_masks=True)

    got_ref = _run_ref_evaluate(ref.DetectionController, train, val)

    for split, (preds, trues) in (("train", train), ("val", val)):
        ours = detection_metrics(preds, trues, thresholds=(0.5, 0.7, 0.9),
                                 with_masks=True)
        exp = got_ref[split]
        # every printed reference metric must match bit-for-bit
        assert set(exp) == {"Mean IoU", "Median IoU", "Masks Mean IoU",
                            "AP 50", "AP 70", "AP 90"}
        for k, v in exp.items():
            np.testing.assert_allclose(ours[k], v, rtol=2e-6, err_msg=f"{split} {k}")
        # sanity: thresholds actually produced distinct mixed TP/FP regimes
        assert 0.0 < ours["AP 90"] < ours["AP 50"] <= 1.0


def test_keypoints_evaluate_parity(monkeypatch):
    ref = _load_ref_module(monkeypatch, "engine/keypoints_controller.py",
                           "ref_keypoints_controller")
    rng = np.random.default_rng(77)
    train = _make_images(rng, 8, with_keypoints=True)
    val = _make_images(rng, 6, with_keypoints=True)

    got_ref = _run_ref_evaluate(ref.KeyPointsController, train, val)

    for split, (preds, trues) in (("train", train), ("val", val)):
        ours = detection_metrics(preds, trues, thresholds=(0.5, 0.7, 0.9),
                                 with_keypoints=True)
        exp = got_ref[split]
        assert {"Mean IoU", "Median IoU", "AP 50", "AP 70", "AP 90",
                "MAE", "MSE", "NMAE", "NME"} <= set(exp)
        for k, v in exp.items():
            np.testing.assert_allclose(ours[k], v, rtol=2e-6, err_msg=f"{split} {k}")


def test_intersection_over_union_signed_quirk(monkeypatch):
    """Disjoint boxes: the reference's unclamped formula yields a *positive*
    spurious IoU when both offsets are negative; ours must reproduce it."""
    ref = _load_ref_module(monkeypatch, "engine/detector_controller.py",
                           "ref_detector_controller_iou")
    from pets_face_recognition_tpu.engine.detection_metrics import (
        intersection_over_union,
    )
    dt = np.array([0.0, 0.0, 10.0, 10.0])
    gt = np.array([20.0, 30.0, 40.0, 50.0])
    np.testing.assert_allclose(
        intersection_over_union(dt, gt),
        ref.DetectionController.intersection_over_union(dt, gt),
        rtol=1e-12,
    )
