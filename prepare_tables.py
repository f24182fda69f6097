"""Run the production pipelines over ``data_25_labeled`` and dump prediction
tables (``detected_head.tsv``, ``detected_body.tsv``, ``landmark.tsv``) for the
offline scorers.

Behavioral rebuild of ``/root/reference/prepare_tables.py``: same directory walk,
same silent skip of failed images, same tsv schemas. Models are loaded from this
framework's checkpoints via the config's pipeline factories (see
``configs/pipelines.py``) instead of the reference's hard-coded torch ckpt paths.
"""

import argparse
from contextlib import suppress
from pathlib import Path

import numpy as np
import pandas as pd
from PIL import Image
from tqdm import tqdm

from pets_face_recognition_tpu.preprocessor import Preproc3, Preproc4, Preproc6
from pets_face_recognition_tpu.utils import get_dict_wrapper

BASE_PTS = np.array([[70, 92], [154, 92], [112, 160]])


def _image_paths(root: Path):
    for input_root in root.iterdir():
        yield from input_root.glob("*/*.jpg")
        yield from input_root.glob("*/*.png")


def prepare_table(preprocessor, data_root: Path, out_path: str | None = None):
    preprocessor.return_for_metrics = True
    data = []
    if isinstance(preprocessor, Preproc3):
        for p in tqdm(list(_image_paths(data_root))):
            with suppress(AssertionError, ValueError, OSError):
                image = np.array(Image.open(p).convert("RGB"))
                pts = preprocessor(image).tolist()
                data.append((p.name, *pts))
        df = pd.DataFrame(data, columns=("query", "Left eye", "Right eye", "Nose"))
        df.to_csv(out_path or "landmark.tsv", index=False, sep="\t")
    else:  # Preproc4 / Preproc6: bbox + scores
        for p in tqdm(list(_image_paths(data_root))):
            with suppress(AssertionError, ValueError, OSError):
                image = np.array(Image.open(p).convert("RGB"))
                bbox, score = preprocessor(image)
                # plain python floats: numpy 2.x scalars repr as
                # ``np.float32(x)`` which the scorer's literal_eval rejects
                # (reference tsvs carry bare floats, score_detection.py:147)
                data.append((p.name, [bbox.tolist()],
                             [float(s) for s in score]))
        df = pd.DataFrame(data, columns=("query", "detections", "scores"))
        default = (
            "detected_body.tsv" if isinstance(preprocessor, Preproc4)
            and not isinstance(preprocessor, Preproc6) else "detected_head.tsv"
        )
        df.to_csv(out_path or default, index=False, sep="\t")
    return df


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=Path,
                        default=Path("../pets_datasets/data_25_labeled"))
    parser.add_argument("--pipelines-config", type=Path,
                        default=Path("configs/pipelines.py"),
                        help="config exposing keypoint_pipeline()/mask_pipeline()"
                             " factories returning jitted model_fns")
    parser.add_argument("--thr", type=float, default=0.9,
                        help="detection score threshold (reference default "
                             "0.9; relax for smoke-corpus drives with weak "
                             "synthetic detectors)")
    args = parser.parse_args()

    cfg = get_dict_wrapper(args.pipelines_config)
    prepare_table(
        Preproc3(loader=cfg.keypoint_pipeline, thr=args.thr, base_pts=BASE_PTS,
                 dsize=(224, 224, 3)),
        args.data.resolve(),
    )
    prepare_table(
        Preproc4(loader=cfg.mask_pipeline, thr=args.thr, use_mask=True,
                 mask_thr=0.7),
        args.data.resolve(),
    )
    prepare_table(Preproc6(loader=cfg.keypoint_pipeline, thr=args.thr),
                  args.data.resolve())


if __name__ == "__main__":
    main()
