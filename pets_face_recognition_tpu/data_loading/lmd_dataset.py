"""CAT_DATASET landmark dataset (``.jpg.cat`` 9-landmark files).

Behavioral rebuild of ``/root/reference/data_loading/lmd_dataset.py:48-156``:

- keep the first 3 landmarks (left eye, right eye, nose);
- synthesize a head bbox from the eye-center ± 1.4×inter-eye horizontally and
  ± 1.8×eye-nose-center vertically, clamped to the image and forced to contain all
  landmarks ±1 px (ref ``:59-71``);
- ``CatLMDSubset``: ±angle or rot90 rotation of image + bbox + keypoints, updating
  the visibility flag when a rotated keypoint leaves the image.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np
from PIL import Image

from .dataset import rot90_boxes, rot90_keypoints
from .transforms import rotate_bbox, rotate_image, rotate_points


class LMDDataset:
    """CelebA + Oxford mixing dataset (human face landmarks paired with random
    animal crops — reference ``lmd_dataset.py:10-45``; unused by production
    configs, kept for capability parity).

    ``celeba[item]`` must yield ``(image, (bbox, landmarks))``; ``oxford`` is an
    :class:`~.oxford.OxfordSubset` with box targets.
    """

    def __init__(self, celeba, oxford, oxford_transform=None,
                 seed: int | None = None):
        self.celeba = celeba
        self.oxford_dataset = oxford
        self.oxford_transform = oxford_transform
        rng = np.random.RandomState(seed)
        reps = 1 + len(celeba) // len(oxford)
        self.support_indexing = rng.permutation(
            list(range(len(oxford))) * reps
        )[: len(celeba)]

    def __len__(self):
        return len(self.celeba)

    def __getitem__(self, item: int):
        celeba_img, (celeba_bbox, celeba_lmd) = self.celeba[item]
        oxford_img, oxford_t = self.oxford_dataset[self.support_indexing[item]]
        box = np.asarray(oxford_t["boxes"][0], int)
        crop = np.asarray(
            Image.fromarray(np.asarray(oxford_img)).crop(tuple(box))
        )
        if self.oxford_transform:
            crop = self.oxford_transform(crop)
        lmd = np.asarray(celeba_lmd, np.float32).copy()
        for i in range(len(lmd)):
            lmd[i] = lmd[i] / celeba_img.shape[i % 2]
        return {"human": celeba_img, "animal": crop, "lmd": lmd[:6]}


class CatLMDDataset:
    def __init__(self, path: str | Path):
        path = Path(path)
        self.paths = [fp for d in sorted(path.iterdir()) if d.is_dir()
                      for fp in sorted(d.glob("*.jpg"))]
        self.lmd = [self.read_lmd(p) for p in self.paths]

    @staticmethod
    def read_lmd(path: Path):
        text = Path(str(path.resolve()) + ".cat").read_text()
        return list(map(int, text.split()))[1:]

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, item: int):
        image = np.array(Image.open(self.paths[item]))
        raw = self.lmd[item]
        lmd = np.array([(raw[i], raw[i + 1], 1) for i in range(0, len(raw), 2)],
                       float)
        center = (lmd[0, :2] + lmd[1, :2]) / 2
        dif_eyes = np.sqrt(((lmd[0, :2] - lmd[1, :2]) ** 2).sum())
        dif_nose = np.sqrt(((center - lmd[2, :2]) ** 2).sum())
        bbox = [
            max(0, min(center[0] - dif_eyes * 1.4, *(lmd[:, 0] - 1))),
            max(0, min(center[1] - dif_nose * 1.8, *(lmd[:, 1] - 1))),
            min(image.shape[1] - 1, max(center[0] + dif_eyes * 1.4,
                                        *(lmd[:, 0] + 1))),
            min(image.shape[0] - 1, max(center[1] + dif_nose * 1.8,
                                        *(lmd[:, 1] + 1))),
        ]
        return image, {
            "boxes": np.round(np.asarray(bbox, float))[None],
            "keypoints": lmd[:3][None],  # (1, 3, 3)
            "labels": np.asarray([0], np.int32),
        }


class CatLMDSubset:
    def __init__(self, dataset, indices: Sequence[int], rotate: float | bool = False,
                 rotate90: bool = False, seed: int | None = None):
        assert not (rotate and rotate90)
        self.dataset = dataset
        self.indices = list(indices)
        self.rotate = 15.0 if rotate is True else float(rotate or 0.0)
        self.rotate90 = rotate90
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx: int):
        image, t = self.dataset[self.indices[idx]]
        h, w = image.shape[:2]
        boxes = t["boxes"].astype(float)
        kps = t["keypoints"].astype(float)

        if self.rotate:
            angle = float(self.rng.uniform(-self.rotate, self.rotate))
            image = rotate_image(image, angle)
            boxes = np.stack(
                [np.round(rotate_bbox(b, angle, (h, w))) for b in boxes]
            )
            for i in range(len(kps)):
                kps[i, :, :2] = rotate_points(kps[i, :, :2], angle, (h, w))
            inb = (
                (kps[..., 0] >= 0) & (kps[..., 0] <= w)
                & (kps[..., 1] >= 0) & (kps[..., 1] <= h)
            )
            kps[..., 2] = inb.astype(float)
        elif self.rotate90:
            k = int(self.rng.randint(0, 4))
            if k:
                image = np.ascontiguousarray(np.rot90(image, k))
                boxes = np.round(rot90_boxes(boxes, k, (h, w)))
                kps[..., :2] = rot90_keypoints(kps[..., :2], k, (h, w))

        return image, {
            "boxes": boxes.astype(np.float32),
            "keypoints": kps.astype(np.float32),
            "labels": t["labels"],
        }
