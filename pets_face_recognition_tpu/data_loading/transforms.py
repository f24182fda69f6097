"""Geometric augmentation helpers (albumentations-equivalent, cv2-based).

Reimplements the handful of albumentations functions the reference datasets use
(``rotate``, ``bbox_rotate``, ``keypoint_rotate``, ``bbox_rot90``,
``keypoint_rot90`` — ``data_loading/oxford.py:12``, ``lmd_dataset.py:6``):
rotation is CCW-positive around the image center, boxes rotate by enclosing the
rotated corners, same-size canvas with reflect-101 border.
"""

from __future__ import annotations

import cv2
import numpy as np


def rotate_image(img: np.ndarray, angle: float,
                 interpolation=cv2.INTER_NEAREST,
                 border=cv2.BORDER_REFLECT_101) -> np.ndarray:
    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
    return cv2.warpAffine(img, m, (w, h), flags=interpolation, borderMode=border)


def rotate_points(pts: np.ndarray, angle: float, hw: tuple[int, int]) -> np.ndarray:
    """Rotate (x, y) points CCW by ``angle`` degrees around the image center."""
    h, w = hw
    m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
    pts = np.asarray(pts, float)
    ones = np.ones((len(pts), 1))
    return (np.concatenate([pts, ones], axis=1) @ m.T).astype(float)


def rotate_bbox(bbox: np.ndarray, angle: float, hw: tuple[int, int]) -> np.ndarray:
    """Rotate an xyxy pixel box: enclose the rotated corners (albumentations
    ``bbox_rotate`` behavior)."""
    x1, y1, x2, y2 = np.asarray(bbox, float)
    corners = np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]])
    rc = rotate_points(corners, angle, hw)
    return np.array([rc[:, 0].min(), rc[:, 1].min(),
                     rc[:, 0].max(), rc[:, 1].max()])
