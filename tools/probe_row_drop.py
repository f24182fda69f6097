"""Why did a query lose its tsv row under int8? (round-5 instrument)

For each image of the named query cards, runs the keypoint detection graph
FLOAT and INT8-kp (the shipping ``PFR_QUANT_COMPONENTS=embedder,kp_head``
config served from a saved quant state) and prints the exact Preproc3
validity inputs (``preprocessor/__init__.py:239-250``): detection score vs
threshold, and the three pairwise landmark distances vs ``min_distance`` —
attributing each membership flip to its mechanism (borderline detection
score vs landmark-geometry collapse).

Runs on CPU by default (a handful of forwards doesn't justify claiming the
exclusively-owned chip).

Usage:
  python tools/probe_row_drop.py --data /tmp/pfr_smoke/test_hard \
      --quant-state /tmp/pfr_quality/quant_int8ship_resnet50_f32.pkl \
      --queries rl900006 rl900077 rl900105 --thr 0.5
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=Path, required=True)
    ap.add_argument("--quant-state", type=Path, required=True)
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--thr", type=float, default=0.5)
    ap.add_argument("--min-distance", type=float, default=5.0)
    ap.add_argument("--ckpt", type=Path, default=None,
                    help="keypoint checkpoint (default: newest results_smoke "
                         "keypoint run)")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from pets_face_recognition_tpu.engine import latest_checkpoint
    from pets_face_recognition_tpu.models import ptq
    from pets_face_recognition_tpu.models.rcnn import (
        keypointrcnn_resnet50_fpn,
    )
    from pets_face_recognition_tpu.preprocessor import letterbox_image

    repo = Path(__file__).resolve().parent.parent
    if args.ckpt is None:
        for d in sorted(repo.glob("results_smoke/*/"), reverse=True):
            if (d / "keypoint_smoke.py").exists() and any(
                    (d / "checkpoints").glob("*")):
                args.ckpt = d / "checkpoints"
                break
    ckpt = latest_checkpoint(args.ckpt) or args.ckpt
    print(f"checkpoint: {ckpt}")

    from pets_face_recognition_tpu.engine import load_params

    params, batch_stats = load_params(ckpt)
    if isinstance(params, dict) and set(params) <= {"model"}:
        params = params["model"]
        batch_stats = batch_stats.get("model", batch_stats)

    def build(quant_kp):
        return keypointrcnn_resnet50_fpn(
            num_classes=2, num_keypoints=3, box_detections_per_img=1,
            quant_kp=quant_kp)

    float_model = build(None)
    fvars = {"params": params, "batch_stats": batch_stats}
    float_fn = jax.jit(lambda x: float_model.apply(fvars, x, train=False))

    runner = ptq.PTQServing(
        "det_keypoint_prod", lambda m: build(m), params, batch_stats,
        example=np.zeros((1, 320, 320, 3), np.float32))
    with open(args.quant_state, "rb") as f:
        runner.load_quant(pickle.load(f)["det_keypoint_prod"])
    int8_fn = runner.serve_fn()

    # find each query card dir anywhere under the corpus
    for q in args.queries:
        hits = list(args.data.glob(f"*/*/{q}"))
        if not hits:
            print(f"{q}: NOT FOUND under {args.data}")
            continue
        folder = hits[0]
        for p in sorted(folder.iterdir()):
            if p.name == "card.json":
                continue
            img = np.array(Image.open(p).convert("RGB"))
            canvas, scale, (px, py) = letterbox_image(img, (320, 320))
            x = jnp.asarray(canvas.astype(np.float32)[None] / 255.0)
            rows = {}
            for label, fn in (("float", float_fn), ("int8kp", int8_fn)):
                out = jax.device_get(fn(x))
                score = float(out["scores"][0, 0])
                valid = bool(out["valid"][0, 0])
                kps = np.round(
                    (np.asarray(out["keypoints"][0, 0, :, :2])
                     - np.array([px, py])) / scale)
                d = [float(np.linalg.norm(kps[a] - kps[b]))
                     for a, b in ((0, 1), (0, 2), (1, 2))]
                row_valid = (valid and score > args.thr
                             and all(v > args.min_distance for v in d))
                rows[label] = dict(score=round(score, 6), det_valid=valid,
                                   dists=[round(v, 2) for v in d],
                                   kps=kps.astype(int).tolist(),
                                   preproc_valid=row_valid)
            flip = rows["float"]["preproc_valid"] != rows["int8kp"][
                "preproc_valid"]
            print(f"{q}/{p.name}: FLIP={flip}")
            for label, r in rows.items():
                print(f"  {label}: {json.dumps(r)}")


if __name__ == "__main__":
    main()
