"""Collate functions → fixed-shape padded batches.

Replaces the reference's list-collates (``/root/reference/utils/collate_fn.py:7-34``),
which hand torchvision variable-size image lists. TPU requires static shapes, so:

- images are letterboxed to one ``(H, W)`` per config (``letterbox_image``);
- per-image targets are padded to ``max_boxes`` with a ``valid`` mask;
- boxes/keypoints are rescaled into letterbox coordinates.
"""

from __future__ import annotations

import numpy as np


def letterbox_image(
    img: np.ndarray, size: tuple[int, int]
) -> tuple[np.ndarray, float, tuple[int, int]]:
    """Aspect-preserving resize + top-left-anchored center pad to ``size=(H, W)``.

    Returns ``(canvas, scale, (pad_x, pad_y))`` so annotations can be mapped with
    ``p' = p * scale + pad``.
    """
    import cv2

    H, W = size
    h, w = img.shape[:2]
    scale = min(H / h, W / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.zeros((H, W) + img.shape[2:], dtype=img.dtype)
    pad_y = (H - nh) // 2
    pad_x = (W - nw) // 2
    canvas[pad_y : pad_y + nh, pad_x : pad_x + nw] = resized
    return canvas, scale, (pad_x, pad_y)


def detection_collate(
    samples: list[tuple[np.ndarray, dict]],
    image_size: tuple[int, int],
    max_boxes: int = 8,
    num_keypoints: int = 0,
    with_masks: bool = False,
    normalize=None,
) -> dict:
    """``[(image, targets)]`` → padded batch dict.

    ``targets`` may contain ``boxes (N, 4)``, ``labels (N,)``,
    ``masks (N, h, w)``, ``keypoints (N, K, 3)``.
    ``normalize``: optional fn on the letterboxed float image (e.g. ImageNet norm).
    """
    B = len(samples)
    H, W = image_size
    out = {
        "images": np.zeros((B, H, W, 3), np.float32),
        "boxes": np.zeros((B, max_boxes, 4), np.float32),
        "labels": np.zeros((B, max_boxes), np.int32),
        "valid": np.zeros((B, max_boxes), bool),
    }
    if with_masks:
        out["masks"] = np.zeros((B, max_boxes, H, W), np.float32)
    if num_keypoints:
        out["keypoints"] = np.zeros((B, max_boxes, num_keypoints, 3), np.float32)

    for b, (img, tgt) in enumerate(samples):
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        if img.shape[-1] == 4:
            img = img[..., :3]
        canvas, scale, (px, py) = letterbox_image(img, (H, W))
        canvas = canvas.astype(np.float32)
        if canvas.max() > 1.5:  # uint8-range input
            canvas = canvas / 255.0
        if normalize is not None:
            canvas = normalize(canvas)
        out["images"][b] = canvas

        boxes = np.asarray(tgt.get("boxes", np.zeros((0, 4))), np.float32)
        n = min(len(boxes), max_boxes)
        if n:
            scaled = boxes[:n] * scale + np.asarray([px, py, px, py], np.float32)
            out["boxes"][b, :n] = scaled
            out["labels"][b, :n] = np.asarray(tgt["labels"])[:n]
            out["valid"][b, :n] = True
            if with_masks and "masks" in tgt:
                for i in range(n):
                    m, _, _ = letterbox_image(
                        np.asarray(tgt["masks"][i], np.float32), (H, W)
                    )
                    out["masks"][b, i] = m
            if num_keypoints and "keypoints" in tgt:
                kps = np.asarray(tgt["keypoints"], np.float32)[:n].copy()
                kps[..., 0] = kps[..., 0] * scale + px
                kps[..., 1] = kps[..., 1] * scale + py
                out["keypoints"][b, :n] = kps
    return out


# ---------------------------------------------------------------------------
# Reference-named entry points (utils/collate_fn.py:7-34). The reference's
# list-collates hand torchvision variable-size image lists; their TPU-native
# equivalents produce padded fixed-shape batches with the same information.
# ---------------------------------------------------------------------------


def detection_collate_fn(samples, image_size=(640, 640), max_boxes=8):
    """Stacked detection collate (ref ``detection_collate_fn``)."""
    return detection_collate(samples, image_size, max_boxes=max_boxes)


def detection_collate_list_fn(samples, image_size=(640, 640), max_boxes=8):
    """List-of-images collate → padded batch with masks
    (ref ``detection_collate_list_fn``)."""
    return detection_collate(samples, image_size, max_boxes=max_boxes,
                             with_masks=any("masks" in t for _, t in samples))


def key_points_collate_list_fn(samples, image_size=(640, 640), max_boxes=8,
                               num_keypoints=3):
    """Keypoint collate (ref ``key_points_collate_list_fn``)."""
    return detection_collate(samples, image_size, max_boxes=max_boxes,
                             num_keypoints=num_keypoints)


def list_img_rec_collate_fn(samples):
    """FE collate over fixed-size crops (ref ``list_img_rec_collate_fn``)."""
    import numpy as _np

    return {
        k: _np.stack([_np.asarray(s[k]) for s in samples]) for k in samples[0]
    }


class DetectionCollate:
    """Picklable configured collate (for DataLoader workers)."""

    def __init__(self, image_size, max_boxes=8, num_keypoints=0,
                 with_masks=False, normalize=None):
        self.image_size = image_size
        self.max_boxes = max_boxes
        self.num_keypoints = num_keypoints
        self.with_masks = with_masks
        self.normalize = normalize

    def __call__(self, samples):
        return detection_collate(
            samples, self.image_size, self.max_boxes, self.num_keypoints,
            self.with_masks, self.normalize,
        )
