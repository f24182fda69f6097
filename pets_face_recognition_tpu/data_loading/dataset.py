"""Identity-labeled image datasets.

Behavioral rebuild of the reference's ``data_loading/dataset.py``:

- ``RecDataset`` (ref lines 67-142): scans a directory of pet-card folders
  (each with a ``card.json`` carrying the animal type and N images), filters by
  animal type + min image count, optionally trial-decodes every image, and exposes
  deterministic uid/index maps **sorted by folder and file name** — the sampling
  parity anchor for :class:`~.pairs.PairGenerator`.
- ``RecSubset`` (ref lines 189-202): index-subset view with its own transform.
- ``SimpleDataset`` (ref lines 145-186): (image, targets) detection dataset over
  pickled path/annotation tables, with optional rot90 of boxes + keypoints.

These stay host-side (PIL/numpy); device work happens in batched jitted pipelines.
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path
from typing import Callable

import numpy as np
from PIL import Image


def check_dir(path: Path, type_: int, min_number: int) -> bool:
    """Card folder filter: has >= min_number images and matches animal type
    (``card.json['pet']['animal']``) — ref ``dataset.py:13-24``."""
    path = Path(path)
    if not path.is_dir():
        return False
    card = path / "card.json"
    if not card.exists():
        return False
    try:
        info = json.loads(card.read_text(encoding="utf-8"))
    except (OSError, json.JSONDecodeError):
        return False
    n_images = len([p for p in path.iterdir() if p.name != "card.json"])
    return n_images >= min_number and int(info["pet"]["animal"]) == type_


def check_images(paths, preprocessor=None):
    """Keep only images that decode (and pass the preprocessor) — ref
    ``dataset.py:27-37``. Failures are silently dropped, matching reference."""
    ok = []
    for path in paths:
        try:
            img = np.asarray(Image.open(path))
            if preprocessor:
                preprocessor(img)
            ok.append(path)
        except Exception:
            pass
    return ok


def init_dataset(path, type_=1, min_number=3, preprocessor=None,
                 paths_to_exclude=None):
    """Full scan with validation — ref ``dataset.py:40-54``."""
    exclude = {Path(p).resolve() for p in (paths_to_exclude or ())}
    user_to_paths = {}
    for dir_ in Path(path).iterdir():
        if not check_dir(dir_, type_, min_number):
            continue
        img_paths = [
            p for p in dir_.iterdir()
            if p.name != "card.json" and p.resolve() not in exclude
        ]
        img_paths = check_images(img_paths, preprocessor)
        if len(img_paths) >= min_number:
            user_to_paths[dir_] = img_paths
    return user_to_paths


def simple_init_dataset(path, type_=1, min_number=3, *_, **__):
    """No-validation scan — ref ``dataset.py:57-64``."""
    user_to_paths = {}
    for dir_ in Path(path).iterdir():
        if not dir_.is_dir():
            continue
        img_paths = [p for p in dir_.iterdir() if p.name != "card.json"]
        if len(img_paths) >= min_number:
            user_to_paths[dir_] = img_paths
    return user_to_paths


class RecDataset:
    """Identity dataset over pet-card folders.

    ``__getitem__`` returns ``{'x': HWC uint8/float array, 'label': int,
    'index': int}`` — the contract the FE controller and collate expect.
    """

    def __init__(
        self,
        path,
        type_: int = 1,
        min_number: int = 3,
        preprocessor: Callable | None = None,
        train_augmentation: Callable | None = None,
        val_augmentation: Callable | None = None,
        init_dataset_method: Callable = init_dataset,
        paths_to_exclude=None,
        val_indices=None,
        start_class: int = 0,
    ):
        self.user_to_paths = init_dataset_method(
            path, type_, min_number, preprocessor, paths_to_exclude
        )
        self.preprocessor = preprocessor
        self.start_class = start_class
        self.train_augmentation = train_augmentation
        self.val_augmentation = val_augmentation

        # Deterministic maps, sorted by (folder name, file name) — must match the
        # reference exactly (dataset.py:87-98) for PairGenerator seed parity.
        self.uid_to_user = dict(
            enumerate(sorted(set(self.user_to_paths), key=lambda x: str(x.name)))
        )
        self.user_to_uid = {u: uid for uid, u in self.uid_to_user.items()}
        flat = [(u, p) for u in self.user_to_paths for p in self.user_to_paths[u]]
        flat.sort(key=lambda t: (str(t[0].name), str(t[1].name)))
        self.index_to_uid = {i: self.user_to_uid[u] for i, (u, _) in enumerate(flat)}
        self.index_to_path = {i: p for i, (_, p) in enumerate(flat)}
        uid_to_indices = defaultdict(list)
        for i, uid in self.index_to_uid.items():
            uid_to_indices[uid].append(i)
        self.uid_to_indices = dict(uid_to_indices)
        self.val_indices = val_indices
        self.label_map = dict(
            zip(self.uid_to_user.keys(), range(len(self.uid_to_user)))
        )

    def __len__(self):
        return len(self.index_to_path)

    def __getitem__(self, item: int):
        if item < 0:
            item += len(self)
        path = self.index_to_path[item]
        suffix = path.suffix.lower()
        if suffix in (".jpg", ".jpeg", ".png"):
            img = np.asarray(Image.open(path).convert("RGB"))
        elif suffix == ".npy":
            img = np.load(path)
        else:
            raise ValueError(f"Unsupported file format: {path}")
        label = self.label_map[self.index_to_uid[item]] + self.start_class

        if self.preprocessor:
            img = self.preprocessor(img)
        is_val = self.val_indices is not None and item in self.val_indices
        if not is_val and self.train_augmentation:
            img = self.train_augmentation(img)
        elif self.val_augmentation:
            img = self.val_augmentation(img)
        return {"x": img, "label": label, "index": item}

    def get_users(self):
        return list(self.user_to_uid.values())

    @property
    def val_indices(self):
        return self._val_indices

    @val_indices.setter
    def val_indices(self, value):
        self._val_indices = set(value) if value is not None else None


class RecSubset:
    """Index-subset view with an optional extra transform (ref 189-202)."""

    def __init__(self, dataset, indices, transform=None):
        self.dataset = dataset
        self.indices = list(indices)
        self.transform = transform

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, item):
        data = self.dataset[self.indices[item]]
        if self.transform:
            data["x"] = self.transform(data["x"])
        return data


class ConcatDataset:
    """Concatenation of map-style datasets (torch ConcatDataset semantics, used by
    the FE configs to merge data_25 + petfinder crops,
    ``configs/cat_fe/cat_fe_head.py:58``)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._offsets = []
        total = 0
        for d in self.datasets:
            self._offsets.append(total)
            total += len(d)
        self._total = total

    def __len__(self):
        return self._total

    def __getitem__(self, item):
        if item < 0:
            item += self._total
        for ds, off in zip(reversed(self.datasets), reversed(self._offsets)):
            if item >= off:
                return ds[item - off]
        raise IndexError(item)


class SimpleDataset:
    """(image, targets) detection dataset over pickled annotation tables
    (ref ``dataset.py:145-186``). Targets dict holds ``boxes (N,4) xyxy``,
    ``labels (N,)``, ``keypoints (N, K, 3)``.

    ``rotate90``: random rot90 of image + boxes + keypoints (train aug).
    """

    def __init__(self, root, paths, others, transform=None, rotate90=False,
                 rng: np.random.RandomState | None = None):
        self.root = Path(root)
        self.paths = paths
        self.others = others
        self.transform = transform
        self.rotate90 = rotate90
        self.rng = rng or np.random.RandomState()

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, item):
        image = np.array(
            Image.open(self.root / str(self.paths[item]).replace("\\", "/"))
        )
        others = {k: np.array(v) for k, v in self.others[item].items()}
        h, w = image.shape[:2]

        if self.rotate90:
            angle = int(self.rng.randint(0, 4))
            if angle:
                image = np.ascontiguousarray(np.rot90(image, angle))
                others["boxes"] = rot90_boxes(
                    others["boxes"].astype(float), angle, (h, w)
                ).round().astype(np.int64)
                if "keypoints" in others:
                    kps = others["keypoints"].astype(float)
                    kps[..., :2] = rot90_keypoints(kps[..., :2], angle, (h, w))
                    others["keypoints"] = kps

        if self.transform:
            image, others = self.transform(image, others)
        return image, others


def rot90_boxes(boxes: np.ndarray, k: int, hw: tuple[int, int]) -> np.ndarray:
    """Rotate xyxy boxes by k*90° CCW (numpy rot90 convention), matching
    albumentations ``bbox_rot90`` as used at ref ``dataset.py:166-168``."""
    h, w = hw
    out = boxes.copy().astype(float)
    for _ in range(k % 4):
        x1, y1, x2, y2 = out[..., 0], out[..., 1], out[..., 2], out[..., 3]
        # CCW 90°: (x, y) -> (y, w - x); new image is (w, h)
        out = np.stack([y1, w - x2, y2, w - x1], axis=-1)
        h, w = w, h
    return out


def rot90_keypoints(kps: np.ndarray, k: int, hw: tuple[int, int]) -> np.ndarray:
    """Rotate (x, y) keypoints by k*90° CCW, matching albumentations
    ``keypoint_rot90``."""
    h, w = hw
    out = kps.copy().astype(float)
    for _ in range(k % 4):
        x, y = out[..., 0], out[..., 1]
        out = np.stack([y, w - 1 - x], axis=-1)
        h, w = w, h
    return out
