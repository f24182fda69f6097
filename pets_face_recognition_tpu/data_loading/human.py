"""Human-face sanity datasets (LFW) — the reference's verification baseline.

Behavioral rebuild of ``/root/reference/data_loading/human.py``: ``LFWDataset``
walks the deep-funneled LFW tree keyed by ``people.csv`` and yields
``{'x', 'label', 'index'}``; ``init_dataset_ms1m`` is the no-filter folder scan
usable as a ``RecDataset`` init method. Unused by production configs — kept for
capability parity (SURVEY.md §2.6).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
from PIL import Image


def init_dataset_ms1m(path, *_, **__):
    """No-filter identity-folder scan (ref ``human.py:13-19``)."""
    user_to_paths = {}
    for dir_ in Path(path).iterdir():
        if dir_.is_dir():
            user_to_paths[dir_] = list(dir_.iterdir())
    return user_to_paths


class LFWDataset:
    def __init__(self, root: str | Path = "lfw"):
        root = Path(root)
        self.p = root / "lfw-deepfunneled" / "lfw-deepfunneled"
        self.keys: dict[int, tuple[str, int]] = {}
        self.dataset: dict[tuple[str, int], Path] = {}
        c = 0
        names = [
            n for n in pd.read_csv(root / "people.csv")["name"].tolist()
            if isinstance(n, str)
        ]
        for dir_ in names:
            files = tuple((self.p / dir_).iterdir())
            keys = [f.name[:-4].split("_") for f in files]
            keys = [("_".join(k[:-1]), int(k[-1])) for k in keys]
            for key, f in zip(keys, files):
                self.dataset[key] = f
                self.keys[c] = key
                c += 1
        self.inverted_keys = {v: k for k, v in self.keys.items()}
        self.labels = {
            name: i for i, name in enumerate(
                sorted({k[0] for k in self.dataset})
            )
        }
        # uid maps so PairGenerator can sample over LFW identities
        self.uid_to_indices: dict[int, list[int]] = {}
        for idx, (name, _) in self.keys.items():
            self.uid_to_indices.setdefault(self.labels[name], []).append(idx)

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, item: int):
        name, id_ = self.keys[item]
        img = np.array(Image.open(self.dataset[name, id_]))
        return {
            "x": np.asarray(img, np.float32) / 255.0,
            "label": self.labels[name],
            "index": item,
        }

    def get_users(self):
        return list(self.labels.values())
