"""Offline dataset transformation: detect→align/crop every image of data_25 and the
petfinder extras into the ``*_transformed_v6_*`` training corpora.

Behavioral rebuild of ``/root/reference/transform_reproduce.py`` — same directory
walks, hard-coded bad-image exclusion lists, silent skip of failed images, skip of
already-transformed outputs, and the >300×400 → re-encode-as-jpg rule. TPU-first
change: images stream through the pipeline in **batches** (``Preproc.batch``) so
the detector runs as one jitted fixed-shape graph instead of the reference's
per-image eager loop (the throughput-critical path of the aligned-crops/sec
benchmark, SURVEY.md §3.3).

Pipelines come from ``--pipelines-config`` (see ``configs/pipelines.py``).
"""

import argparse
import json
import os
from contextlib import suppress
from pathlib import Path

import numpy as np
from PIL import Image
from tqdm import tqdm

from pets_face_recognition_tpu.data_loading import RecDataset
from pets_face_recognition_tpu.preprocessor import Preproc3, Preproc4
from pets_face_recognition_tpu.utils import get_dict_wrapper

v = "v6"
BASE_PTS = np.array([[70, 92], [154, 92], [112, 160]])

# Bad images excluded by hand in the reference (transform_reproduce.py:58-105),
# windows-style separators normalized.
DATA_25_EXCLUDE = [
    "data_25/rl131336/216319.jpg", "data_25/rl378360/660074.jpg",
    "data_25/rf337006/589105.jpg", "data_25/rl341945/597666.jpg",
    "data_25/rl254355/447992.jpg", "data_25/rl302213/529924.jpg",
    "data_25/rf327026/572016.jpg", "data_25/rf287909/505121.jpg",
    "data_25/rf413612/717733.jpg", "data_25/rl257226/452879.jpg",
    "data_25/rl257226/452880.jpg", "data_25/rl411182/713855.jpg",
    "data_25/rf292282/512681.jpg", "data_25/rf263807/464166.jpg",
    "data_25/rf146140/246925.jpg", "data_25/rf230595/407467.jpg",
    "data_25/rl209386/373061.jpg", "data_25/rf428033/742644.jpg",
    "data_25/rl270079/474803.jpg", "data_25/rf278099/488547.jpg",
    "data_25/rl401247/697651.jpg", "data_25/rl381795/666073.jpg",
    "data_25/rf233445/412363.jpg", "data_25/rl223935/650763.jpg",
    "data_25/rl343571/600399.jpg", "data_25/rl381795/666046.jpg",
    "data_25/rl381795/666053.jpg", "data_25/rl381795/666059.jpg",
    "data_25/rl381795/666067.jpg", "data_25/rl381795/666077.jpg",
    "data_25/rl381795/666081.jpg", "data_25/rl381795/666089.jpg",
    "data_25/rl381795/666094.jpg", "data_25/rl381795/666097.jpg",
    "data_25/rl381795/666103.jpg", "data_25/rf133909/221703.jpg",
    "data_25/rf133909/221704.jpg", "data_25/rf133909/221705.jpg",
    "data_25/rf133831/221554.jpg", "data_25/rf133831/221555.jpg",
    "data_25/rf133831/221556.jpg",
]

DATA_ROOT = Path(os.environ.get("PFR_DATA_ROOT", "../pets_datasets"))


def transform_dataset(input_root, preprocessor, output_root=None, paths=None,
                      out_paths=None, batch_size: int = 32) -> None:
    """Batched detect→transform→save (reference ``transform_dataset``,
    ``transform_reproduce.py:20-53``)."""
    input_root = Path(input_root)
    if paths is None:
        paths = list(input_root.glob("*/*.jpg")) + list(
            input_root.glob("*/*.png"))
    paths = list(paths)
    if output_root is not None:
        output_root = Path(output_root)
        output_root.mkdir(parents=True, exist_ok=True)

    # resolve output path + skip already-done entries (ref :46-47)
    todo = []
    for i, p in enumerate(paths):
        if out_paths is None:
            rel = output_root / os.path.relpath(p, input_root)
        else:
            rel = Path(out_paths[i])
        if rel.exists() or (rel.parent / (rel.name[:-4] + ".jpg")).exists():
            continue
        todo.append((Path(p), rel))

    use_batch = hasattr(preprocessor, "batch")
    # a fixed-shape serving pipeline dictates its own chunk size: every chunk
    # is padded to serve_batch on device, so chunking any larger would assert
    serve = getattr(preprocessor, "serve_batch", None)
    if serve is not None:
        batch_size = serve
    for start in tqdm(range(0, len(todo), batch_size)):
        chunk = todo[start : start + batch_size]
        images, metas = [], []
        for p, rel in chunk:
            with suppress(OSError, ValueError):
                images.append(np.array(Image.open(p).convert("RGB")))
                metas.append(rel)
        if not images:
            continue
        if use_batch:
            outs, valid, _ = preprocessor.batch(images)
            for img_out, ok, rel in zip(outs, valid, metas):
                if not ok or img_out is None:
                    continue
                _save(np.asarray(img_out), rel)
        else:  # single-image compat path
            for img, rel in zip(images, metas):
                with suppress(AssertionError, ValueError, OSError):
                    _save(np.asarray(preprocessor(img)), rel)


def _save(processed: np.ndarray, rel_path: Path) -> None:
    processed = np.clip(processed, 0, 255).astype(np.uint8)
    rel_path.parent.mkdir(parents=True, exist_ok=True)
    if processed.shape[0] * processed.shape[1] > 300 * 400:
        rel_path = rel_path.parent / (rel_path.name[:-4] + ".jpg")
    Image.fromarray(processed).save(rel_path)


def data_25(preprocessor, type_: int = 1) -> None:
    assert type_ in (1, 2)
    exclude = [(DATA_ROOT / p).resolve() for p in DATA_25_EXCLUDE]
    ds = RecDataset(DATA_ROOT / "data_25", type_, 1, paths_to_exclude=exclude)
    paths = [ds.index_to_path[i] for i in range(len(ds))]
    transform_dataset(
        DATA_ROOT / "data_25",
        preprocessor,
        DATA_ROOT / f"data_25_transformed_{v}_{'dog' if type_ == 1 else 'cat'}s",
        paths,
    )


def extra_petfinder(preprocessor, tag: str = "dog") -> None:
    if tag == "dog":
        out = DATA_ROOT / f"petfinder_extra_dogs_transformed_{v}"
        src = DATA_ROOT / "petfinder_extra_dogs"
        exclude = (
            list((src / "48683845").iterdir())
            + list((src / "45528036").iterdir())
            + [src / "48009947" / "3.png"]
        )
    else:
        out = DATA_ROOT / f"petfinder_extra_cats_transformed_{v}"
        src = DATA_ROOT / "petfinder_extra_cats"
        exclude = [src / "24355557" / "4.png"]
    exclude = {p.resolve() for p in exclude}
    paths = [
        j.resolve() for d in src.resolve().iterdir() for j in d.iterdir()
        if j.resolve() not in exclude
    ]
    transform_dataset(src, preprocessor, output_root=out, paths=paths)


def main():
    global v, DATA_ROOT
    parser = argparse.ArgumentParser()
    parser.add_argument("--pipelines-config", type=Path,
                        default=Path("configs/pipelines.py"))
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--data-root", type=Path, default=DATA_ROOT,
                        help="datasets root (default ../pets_datasets, env "
                             "PFR_DATA_ROOT)")
    parser.add_argument("--stages", default="aligned,masked",
                        help="comma list of {aligned,masked} passes to run")
    args = parser.parse_args()
    DATA_ROOT = args.data_root
    cfg = get_dict_wrapper(args.pipelines_config)
    stages = set(args.stages.split(","))

    if "aligned" in stages:
        pre3 = Preproc3(loader=cfg.keypoint_pipeline, base_pts=BASE_PTS,
                        dsize=(224, 224, 3), serve_batch=args.batch_size)
        v = "v6"
        extra_petfinder(pre3, "dog")
        data_25(pre3, 1)
        data_25(pre3, 2)
        extra_petfinder(pre3, "cat")

    if "masked" in stages:
        pre4 = Preproc4(loader=cfg.mask_pipeline, use_mask=True, mask_thr=0.7,
                        serve_batch=args.batch_size)
        v = "v4_masked"
        extra_petfinder(pre4, "dog")
        data_25(pre4, 1)
        data_25(pre4, 2)
        extra_petfinder(pre4, "cat")


if __name__ == "__main__":
    main()
