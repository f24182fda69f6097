"""Image preprocessing / augmentation helpers.

Rebuild of ``/root/reference/utils/preprocs.py`` without the imgaug dependency
(not available here): the same augmentation recipe — random brightness/contrast,
sharpness, additive Gaussian noise, motion/Gaussian blur with the same probabilities
and ranges (ref lines 14-25) — implemented with cv2/PIL/numpy.
"""

from __future__ import annotations

import cv2
import numpy as np
from PIL import Image, ImageEnhance, ImageOps


def clahe(img: np.ndarray) -> np.ndarray:
    """Per-channel CLAHE, clip 40, 8×8 tiles (ref ``preprocs.py:7-10``)."""
    eq = cv2.createCLAHE(40.0, (8, 8))
    channels = [eq.apply(img[:, :, i]) for i in range(img.shape[-1])]
    return np.stack(channels, axis=-1).astype(np.uint8)


class AugCombo:
    """Photometric train augmentation matching the reference imgaug pipeline:

    - 30%: one of brightness / contrast enhancement (factor ~ U[0.5, 1.5]);
    - 50%: sharpness enhancement (factor ~ U[0.5, 1.5]);
    - 50%: additive Gaussian noise, sigma ~ U[0, 0.03*255];
    - 30%: one of motion blur (k ∈ [3, 9], angle ∈ [-45, 45]) / Gaussian blur
      (sigma ~ U[0, 1.3]).
    """

    def __init__(self, rng: np.random.RandomState | None = None):
        self.rng = rng or np.random.RandomState()

    def __call__(self, img: np.ndarray) -> np.ndarray:
        rng = self.rng
        out = img
        if rng.rand() < 0.3:
            pil = Image.fromarray(out.astype(np.uint8))
            factor = rng.uniform(0.5, 1.5)
            enhancer = (
                ImageEnhance.Brightness if rng.rand() < 0.5 else ImageEnhance.Contrast
            )
            out = np.asarray(enhancer(pil).enhance(factor))
        if rng.rand() < 0.5:
            pil = Image.fromarray(out.astype(np.uint8))
            out = np.asarray(
                ImageEnhance.Sharpness(pil).enhance(rng.uniform(0.5, 1.5))
            )
        if rng.rand() < 0.5:
            sigma = rng.uniform(0, 0.03 * 255)
            noise = rng.normal(0, sigma, out.shape)
            out = np.clip(out.astype(np.float32) + noise, 0, 255).astype(np.uint8)
        if rng.rand() < 0.3:
            if rng.rand() < 0.5:
                k = int(rng.randint(3, 10))
                angle = rng.uniform(-45, 45)
                kernel = _motion_kernel(k, angle)
                out = cv2.filter2D(out, -1, kernel)
            else:
                sigma = rng.uniform(1e-3, 1.3)
                out = cv2.GaussianBlur(out, (0, 0), sigma)
        return out


def _motion_kernel(k: int, angle_deg: float) -> np.ndarray:
    """Linear motion-blur kernel of size k at the given angle."""
    kernel = np.zeros((k, k), np.float32)
    kernel[k // 2, :] = 1.0
    rot = cv2.getRotationMatrix2D((k / 2 - 0.5, k / 2 - 0.5), angle_deg, 1.0)
    kernel = cv2.warpAffine(kernel, rot, (k, k))
    s = kernel.sum()
    return kernel / s if s > 0 else kernel


def aug_combo(img: np.ndarray) -> np.ndarray:
    return AugCombo()(img)


def padding(img: Image.Image, expected_size: int = 320) -> Image.Image:
    """Center-pad a PIL image to a square ``expected_size`` (ref ``preprocs.py:32-39``)."""
    dw = expected_size - img.size[0]
    dh = expected_size - img.size[1]
    pad = (dw // 2, dh // 2, dw - dw // 2, dh - dh // 2)
    return ImageOps.expand(img, pad)


def resize_with_padding(img: Image.Image,
                        expected_size: tuple[int, int] = (256, 256)) -> Image.Image:
    """Letterbox: thumbnail to fit, then center-pad (ref ``preprocs.py:42-49``).

    Used on body crops before the body FE (``generate_tsv_to_reproduce1.py:216``).
    """
    img = img.copy()
    img.thumbnail((expected_size[0], expected_size[1]))
    dw = expected_size[0] - img.size[0]
    dh = expected_size[1] - img.size[1]
    pad = (dw // 2, dh // 2, dw - dw // 2, dh - dh // 2)
    return ImageOps.expand(img, pad)


def to_model_input(img: np.ndarray) -> np.ndarray:
    """HWC uint8 [0,255] → float32 [0,1] (torchvision ToTensor semantics, minus the
    CHW transpose — this framework is NHWC)."""
    return np.asarray(img, np.float32) / 255.0


class FETrainAug:
    """FE training augmentation matching the reference compose
    (``configs/cat_fe/cat_fe_head.py:18-27``): 10% sharpness-0 (blur), 30%
    autocontrast, random 220×220 crop resized back to 224, ±5° rotation; output is
    float32 HWC in [0, 1] (ToTensor semantics minus the CHW transpose)."""

    def __init__(self, rng: np.random.RandomState | None = None,
                 crop: int = 220, size: int = 224, degrees: float = 5.0):
        self.rng = rng or np.random.RandomState()
        self.crop = crop
        self.size = size
        self.degrees = degrees

    def __call__(self, img: np.ndarray) -> np.ndarray:
        rng = self.rng
        pil = Image.fromarray(np.asarray(img, np.uint8))
        if rng.rand() < 0.1:
            pil = ImageEnhance.Sharpness(pil).enhance(0.0)
        if rng.rand() < 0.3:
            pil = ImageOps.autocontrast(pil)
        w, h = pil.size
        if w >= self.crop and h >= self.crop:
            x0 = rng.randint(0, w - self.crop + 1)
            y0 = rng.randint(0, h - self.crop + 1)
            pil = pil.crop((x0, y0, x0 + self.crop, y0 + self.crop))
        pil = pil.resize((self.size, self.size), Image.BILINEAR)
        angle = rng.uniform(-self.degrees, self.degrees)
        pil = pil.rotate(angle, resample=Image.NEAREST)
        return np.asarray(pil, np.float32) / 255.0


class FEValAug:
    """FE validation transform: just ToTensor semantics (float [0, 1])."""

    def __call__(self, img: np.ndarray) -> np.ndarray:
        return np.asarray(img, np.float32) / 255.0


# ImageNet statistics used by torchvision-pretrained backbones.
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def imagenet_normalize(img01: np.ndarray) -> np.ndarray:
    """Normalize a [0,1] float image with ImageNet statistics."""
    return (img01 - IMAGENET_MEAN) / IMAGENET_STD
