"""Generic offline dataset transformation CLI.

Behavioral counterpart of ``/root/reference/transform_dataset.py`` (the ad-hoc
editable sibling of ``transform_reproduce.py``): run a chosen pipeline over an
input tree and write transformed crops, skipping failures silently.

``python transform_dataset.py --input DIR --output DIR --pipeline head|body|head_bbox``
"""

import argparse
from pathlib import Path

import numpy as np

from pets_face_recognition_tpu.preprocessor import Preproc3, Preproc4, Preproc6
from pets_face_recognition_tpu.utils import get_dict_wrapper

from transform_reproduce import BASE_PTS, transform_dataset


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", type=Path, required=True)
    parser.add_argument("--output", type=Path, required=True)
    parser.add_argument("--pipeline", choices=("head", "body", "head_bbox"),
                        default="head")
    parser.add_argument("--pipelines-config", type=Path,
                        default=Path("configs/pipelines.py"))
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--thr", type=float, default=0.9)
    parser.add_argument("--masked", action="store_true")
    parser.add_argument("--mask-thr", type=float, default=0.5)
    args = parser.parse_args()

    cfg = get_dict_wrapper(args.pipelines_config)
    if args.pipeline == "head":
        pre = Preproc3(loader=cfg.keypoint_pipeline, thr=args.thr,
                       base_pts=BASE_PTS, dsize=(224, 224, 3),
                       serve_batch=args.batch_size)
    elif args.pipeline == "body":
        pre = Preproc4(loader=cfg.mask_pipeline, thr=args.thr,
                       use_mask=args.masked, mask_thr=args.mask_thr,
                       serve_batch=args.batch_size)
    else:
        pre = Preproc6(loader=cfg.keypoint_pipeline, thr=args.thr,
                       serve_batch=args.batch_size)

    transform_dataset(args.input, pre, args.output,
                      batch_size=args.batch_size)


if __name__ == "__main__":
    main()
