"""Detect → align/crop inference pipelines (the reference "Preproc" classes).

Behavioral rebuild of ``/root/reference/preprocessor/__init__.py`` with the three
production pipelines (SURVEY.md §2.7):

- :class:`Preproc3` — Keypoint R-CNN head+landmarks → validity checks (top score >
  ``thr``, pairwise landmark distance > ``min_distance``) → homography alignment to
  ``base_pts``/``dsize`` (ref ``:161-216``);
- :class:`Preproc4` — Mask R-CNN body → score check → bbox crop, optional
  mask-multiply + mask-derived bbox tightening (ref ``:219-274``);
- :class:`Preproc6` — Keypoint R-CNN head **bbox** crop, no alignment (ref
  ``:277-319``);
- :class:`IdentityPreproc` — passthrough (ref ``:741-743``).

TPU-first changes:
- the core is ``batch(images)`` → ``(outputs, valid)``: one jitted
  detect→decode→align/crop graph over a fixed-size letterboxed batch. Failed images
  return ``valid=False`` instead of raising — the batched analog of the reference's
  assert-and-skip semantics (``transform_reproduce.py:41``);
- ``__call__(img)`` keeps the reference single-image contract (raises
  ``AssertionError`` on failure) for the transform/table scripts;
- crops are produced by a fused device-side warp (bbox → letterboxed canvas affine)
  instead of host crop + PIL ``thumbnail`` (``utils/preprocs.py:42-49``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.homography import align_crop, solve_homography, warp_perspective
from ..ops.masks import paste_mask_np
from ..utils.collate import letterbox_image
from .align import align

__all__ = [
    "Preproc3",
    "Preproc4",
    "Preproc5",
    "Preproc6",
    "Preproc7",
    "Preproc8",
    "Preproc9",
    "Preproc10",
    "Preproc11",
    "Preproc12",
    "Preproc13",
    "PreprocCombined",
    "IdentityPreproc",
    "align",
    "bbox_crop_letterbox",
]

# Canonical head landmarks → 224×224 (generate_tsv_to_reproduce1.py:151-154).
DEFAULT_BASE_PTS = np.array([[70.0, 92.0], [154.0, 92.0], [112.0, 160.0]],
                            np.float32)


def _input_dtype() -> str:
    """Device-boundary input dtype knob (``PFR_INPUT_DTYPE``: float32 |
    bfloat16) — the pipeline analog of ``bench.py --input-dtype``."""
    import os

    v = os.environ.get("PFR_INPUT_DTYPE", "float32")
    if v not in ("float32", "bfloat16"):
        raise ValueError(f"PFR_INPUT_DTYPE={v!r}: float32 | bfloat16")
    return v


def _affine_h(scale: jnp.ndarray, tx: jnp.ndarray, ty: jnp.ndarray):
    """(3,3) homography for ``dst = src * scale + (tx, ty)``."""
    z = jnp.zeros_like(scale)
    o = jnp.ones_like(scale)
    return jnp.stack([
        jnp.stack([scale, z, tx], -1),
        jnp.stack([z, scale, ty], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def bbox_crop_letterbox(images: jnp.ndarray, boxes: jnp.ndarray,
                        out_size: tuple[int, int]) -> jnp.ndarray:
    """Device-side batched bbox crop + aspect-preserving letterbox resize.

    Equivalent of host crop + ``resize_with_padding``
    (``generate_tsv_to_reproduce1.py:216``, ``utils/preprocs.py:42-49``).
    """
    oh, ow = out_size
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    scale = jnp.minimum(oh / bh, ow / bw)
    tx = (ow - bw * scale) / 2.0 - x1 * scale
    ty = (oh - bh * scale) / 2.0 - y1 * scale
    Hs = _affine_h(scale, tx, ty)
    return jax.vmap(
        lambda im, h: warp_perspective(im, h, (oh, ow))
    )(images.astype(jnp.float32), Hs)


class _ModelPipeline:
    """Shared machinery: hold a jitted detector forward + postprocess graph.

    ``model_fn(images) -> detections dict`` must be a jittable callable (typically
    ``lambda x: model.apply(variables, x, train=False)``). Models are *injected*
    rather than loaded from torch checkpoints (the reference reloads its model on
    unpickle, ``preprocessor/__init__.py`` __setstate__ — here ``loader`` plays that
    role).
    """

    def __init__(self, model_fn: Callable | None = None,
                 loader: Callable | None = None,
                 input_size: tuple[int, int] = (320, 320),
                 serve_batch: int | None = None):
        assert model_fn is not None or loader is not None
        self._model_fn = model_fn
        self._loader = loader
        self._load_error = None
        self.input_size = tuple(input_size)
        # Fixed serving batch: when set, every detector call is zero-padded to
        # exactly this many images so ONE executable serves all chunk sizes.
        # Jitting at the literal chunk length compiles (and keeps resident) one
        # detector graph per distinct corpus-tail length — wasteful anywhere,
        # and on this image's remote-compile backend each extra shape costs
        # minutes (and executable churn has produced TPU-worker crashes).
        self.serve_batch = serve_batch

    @property
    def model_fn(self):
        if self._model_fn is None:
            # A failed model BUILD is a configuration error (bad checkpoint
            # path, quant-state mismatch, ...), not a bad image: wrap it so
            # the per-image silent-skip semantics (ref
            # ``generate_tsv_to_reproduce1.py:203-210`` catching per-image
            # failures) can never swallow it — callers catch
            # AssertionError/ValueError/OSError only. The failure is cached
            # so repeated accesses fail fast instead of re-paying the
            # checkpoint-load cost per image (ADVICE r4 #3).
            if self._load_error is not None:
                raise self._load_error
            try:
                self._model_fn = self._loader()
            except Exception as e:
                self._load_error = RuntimeError(
                    f"{type(self).__name__}: pipeline model load failed "
                    f"(configuration error, not an image failure): {e}")
                raise self._load_error from e
        return self._model_fn

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_model_fn"] = None  # drop the jitted graph, reload on unpickle
        state["_load_error"] = None
        return state

    def _prepare(self, images: list[np.ndarray] | np.ndarray):
        """Letterbox a list of HWC uint8/float images to the model input size.

        Returns (batch (B,H,W,3) float32 in [0,1], scales (B,), pads (B,2)).
        """
        if isinstance(images, np.ndarray) and images.ndim == 3:
            images = [images]
        H, W = self.input_size
        batch = np.zeros((len(images), H, W, 3), np.float32)
        scales = np.zeros(len(images), np.float32)
        pads = np.zeros((len(images), 2), np.float32)
        for i, img in enumerate(images):
            img = np.asarray(img)
            if img.ndim == 2:
                img = np.stack([img] * 3, -1)
            if img.shape[-1] == 4:
                img = img[..., :3]
            canvas, scale, (px, py) = letterbox_image(img, (H, W))
            canvas = canvas.astype(np.float32)
            if canvas.max() > 1.5:
                canvas = canvas / 255.0
            batch[i] = canvas
            scales[i] = scale
            pads[i] = (px, py)
        return batch, scales, pads

    def _detect(self, images):
        """``_prepare`` + detector forward, zero-padded to ``serve_batch``.

        Returns ``(out, n, scales, pads)`` with every detector output sliced
        back to the ``n = len(images)`` real rows.
        """
        batch, scales, pads = self._prepare(images)
        n = len(batch)
        if self.serve_batch is not None and n != self.serve_batch:
            assert n <= self.serve_batch, (
                f"chunk of {n} images exceeds serve_batch={self.serve_batch}")
            pad = np.zeros((self.serve_batch - n, *batch.shape[1:]), np.float32)
            batch = np.concatenate([batch, pad])
        x = jnp.asarray(batch)
        if _input_dtype() == "bfloat16":
            # bf16-resident device input (the serving default in bench.py):
            # one 2^-9-relative pixel rounding at the boundary; models upcast
            # to their compute dtype. Quality impact measured by
            # tools/quality_instrument.py (PERF.md round-4 table).
            x = x.astype(jnp.bfloat16)
        dets = self.model_fn(x)
        out = {k: np.asarray(v)[:n] for k, v in jax.device_get(dets).items()}
        return out, n, scales, pads


class Preproc3(_ModelPipeline):
    """Head landmarks → aligned crop (production head pipeline, ref ``:161-216``)."""

    def __init__(self, model_fn=None, loader=None, thr: float = 0.9,
                 min_distance: float = 5.0, base_pts=DEFAULT_BASE_PTS,
                 dsize=(224, 224, 3), input_size=(320, 320),
                 return_for_metrics: bool = False,
                 serve_batch: int | None = None):
        super().__init__(model_fn, loader, input_size, serve_batch)
        self.thr = thr
        self.min_distance = min_distance
        self.base_pts = np.asarray(base_pts, np.float32)
        self.dsize = tuple(dsize)
        self.return_for_metrics = return_for_metrics

    def batch(self, images) -> tuple[np.ndarray, np.ndarray, dict]:
        """(B images) → (aligned (B, h, w, 3) uint8-range float, valid (B,), raw)."""
        out, n, scales, pads = self._detect(images)

        scores = out["scores"][:, 0]
        det_valid = out["valid"][:, 0]
        kps = out["keypoints"][:, 0, :, :2]  # (B, 3, 2) letterbox coords
        # back to original image coordinates; reference rounds keypoints to int
        # before the distance check and alignment (ref :181)
        kps = np.round(
            (kps - pads[:, None, :]) / scales[:, None, None]
        ).astype(np.float32)

        # validity: top score > thr AND pairwise landmark distances > min_distance
        # (ref :178-187)
        d01 = np.linalg.norm(kps[:, 0] - kps[:, 1], axis=-1)
        d02 = np.linalg.norm(kps[:, 0] - kps[:, 2], axis=-1)
        d12 = np.linalg.norm(kps[:, 1] - kps[:, 2], axis=-1)
        valid = (
            det_valid
            & (scores > self.thr)
            & (d01 > self.min_distance)
            & (d02 > self.min_distance)
            & (d12 > self.min_distance)
        )

        # Align per original image. Original photos have heterogeneous shapes —
        # warping them on device would force one compile per unique shape (and
        # this environment's remote compiler makes that catastrophic), so the
        # variable-size compat path warps on host with cv2 using OUR homography
        # solve (cv2.warpPerspective is the reference's own warp,
        # preprocessor/align.py:14 — exact parity by construction). The
        # fixed-shape production path is the batched device kernel in
        # ``serving.EmbeddingService`` / ``ops.pallas_warp``.
        import cv2

        out_hw = self.dsize[:2]
        aligned = np.zeros((n, *out_hw, 3), np.float32)
        img_list = [images] if isinstance(images, np.ndarray) and np.ndim(
            images) == 3 else images
        # The reference ROUNDS both prepended centroids to ints
        # (``preprocessor/align.py:8-9``) which makes the exact 4-point
        # homography slightly projective — same semantics as the batched
        # device path (``ops.homography.align_crop``). kps are already
        # rounded ints (ref :181), so the centroid round matches np exactly.
        solve_pts = np.concatenate(
            [np.round(kps.mean(axis=1, keepdims=True)), kps], axis=1
        )
        base4 = np.concatenate(
            [np.round(self.base_pts.mean(axis=0, keepdims=True)),
             self.base_pts], axis=0
        )
        Hs = np.asarray(solve_homography(
            jnp.asarray(solve_pts), jnp.broadcast_to(
                jnp.asarray(base4), (n, 4, 2))
        ))
        for i, img in enumerate(img_list):
            if not valid[i]:
                continue
            img = np.asarray(img)
            if img.ndim == 2:
                img = np.stack([img] * 3, -1)
            aligned[i] = cv2.warpPerspective(
                img[..., :3].astype(np.float32), Hs[i],
                (out_hw[1], out_hw[0]),
            )
        raw = {"scores": scores, "keypoints": kps,
               "boxes": (out["boxes"][:, 0] - np.tile(pads, 2))
               / scales[:, None]}
        return aligned, np.asarray(valid), raw

    def __call__(self, img: np.ndarray):
        aligned, valid, raw = self.batch([img])
        assert valid[0], "Preproc3: low score or degenerate landmarks"
        if self.return_for_metrics:
            # reference returns the rounded-int landmark array (ref :189-190)
            return raw["keypoints"][0].astype(int)
        return aligned[0]


class Preproc4(_ModelPipeline):
    """Body bbox crop via Mask R-CNN (production body pipeline, ref ``:219-274``)."""

    def __init__(self, model_fn=None, loader=None, thr: float = 0.9,
                 use_mask: bool = False, mask_thr: float = 0.5,
                 out_size: tuple[int, int] | None = None,
                 input_size=(320, 320), return_for_metrics: bool = False,
                 serve_batch: int | None = None, masked: bool | None = None):
        super().__init__(model_fn, loader, input_size, serve_batch)
        self.thr = thr
        # ``masked`` is the reference's keyword (ref :221); ``use_mask`` kept
        # as this repo's historical spelling — either works.
        self.use_mask = use_mask if masked is None else masked
        self.mask_thr = mask_thr
        self.out_size = out_size
        self.return_for_metrics = return_for_metrics

    def batch(self, images):
        """→ (crops, valid, raw). ``out_size`` set: fixed-size letterboxed crops
        on device; otherwise host-side variable-size crops (compat path)."""
        out, _, scales, pads = self._detect(images)

        all_scores = out["scores"]
        scores = all_scores[:, 0]
        valid = out["valid"][:, 0] & (scores > self.thr)
        boxes = (out["boxes"][:, 0] - np.tile(pads, 2)) / scales[:, None]

        img_list = [images] if isinstance(images, np.ndarray) and np.ndim(
            images) == 3 else images

        boxes = boxes.copy()
        crops = []
        for i, img in enumerate(img_list):
            img = np.asarray(img)
            if img.ndim == 2:
                img = np.stack([img] * 3, -1)
            img = img[..., :3].astype(np.float32)
            if not valid[i]:
                crops.append(None)
                continue
            h, w = img.shape[:2]
            # ref :235 rounds the box to int BEFORE the mask tightening
            bb = np.round(boxes[i]).astype(int)
            if self.use_mask and "masks" in out:
                # ref :236-243: paste the box-frame mask at FULL original
                # resolution (torchvision postprocess semantics), threshold
                # strictly (> mask_thr), multiply the image, and clamp the box
                # to the thresholded mask's row/col extents.
                full = paste_mask_np(
                    np.asarray(out["masks"][i, 0], np.float32),
                    boxes[i].astype(np.float64), h, w,
                )
                binary = (full > self.mask_thr).astype(np.int32)
                cols = binary.sum(axis=0) != 0
                rows_nz = binary.sum(axis=1) != 0
                if not cols.any():
                    # ref :240 ``.index(False)`` raises ValueError on an
                    # all-zero mask — the image is silently dropped upstream
                    # (transform_reproduce.py:41 suppresses ValueError)
                    valid[i] = False
                    crops.append(None)
                    continue
                img = img * binary[:, :, None]
                bb[0] = max(bb[0], int(np.argmax(cols)))
                bb[1] = max(bb[1], int(np.argmax(rows_nz)))
                bb[2] = min(bb[2], w - int(np.argmax(cols[::-1])))
                bb[3] = min(bb[3], h - int(np.argmax(rows_nz[::-1])))
                # the tightened box is what return_for_metrics reports
                # (prepare_tables.py writes it to detected_body.tsv)
                boxes[i] = bb
            x1, y1 = max(int(bb[0]), 0), max(int(bb[1]), 0)
            x2, y2 = min(int(bb[2]), w), min(int(bb[3]), h)
            if x2 <= x1 or y2 <= y1:
                valid[i] = False
                crops.append(None)
                continue
            crops.append(img[y1:y2, x1:x2])

        if self.out_size is not None:
            fixed = np.zeros((len(img_list), *self.out_size, 3), np.float32)
            for i, c in enumerate(crops):
                if c is None:
                    continue
                canvas, _, _ = letterbox_image(c.astype(np.float32),
                                               self.out_size)
                fixed[i] = canvas
            crops = fixed
        raw = {"scores": scores, "boxes": boxes,
               "all_scores": np.where(out["valid"], all_scores, 0.0)}
        return crops, np.asarray(valid), raw

    def __call__(self, img: np.ndarray):
        crops, valid, raw = self.batch([img])
        assert valid[0], "Preproc4: low detection score"
        if self.return_for_metrics:
            # reference returns (rounded bbox, full score array) (ref :249-250)
            return (np.round(raw["boxes"][0]).astype(int),
                    raw["all_scores"][0])
        return crops[0]


class Preproc6(Preproc4):
    """Head bbox crop (no alignment): Keypoint R-CNN boxes (ref ``:277-319``)."""

    def __init__(self, model_fn=None, loader=None, thr: float = 0.9,
                 out_size=None, input_size=(320, 320),
                 return_for_metrics: bool = False,
                 serve_batch: int | None = None):
        super().__init__(model_fn, loader, thr=thr, use_mask=False,
                         out_size=out_size, input_size=input_size,
                         return_for_metrics=return_for_metrics,
                         serve_batch=serve_batch)


class Preproc5(_ModelPipeline):
    """Mask R-CNN soft-mask crop (ref ``:613-655``): mask probabilities below
    ``mask_thr`` are squared (soft darkening), those above become 1; the
    weighted image is cropped to the (rounded) top detection box — no
    mask-derived bbox tightening, unlike Preproc4."""

    def __init__(self, model_fn=None, loader=None, thr: float = 0.9,
                 mask_thr: float = 0.5, input_size=(320, 320),
                 serve_batch: int | None = None):
        super().__init__(model_fn, loader, input_size, serve_batch)
        self.thr = thr
        self.mask_thr = mask_thr

    def batch(self, images):
        out, _, scales, pads = self._detect(images)
        scores = out["scores"][:, 0]
        valid = out["valid"][:, 0] & (scores > self.thr)
        boxes = (out["boxes"][:, 0] - np.tile(pads, 2)) / scales[:, None]

        img_list = [images] if isinstance(images, np.ndarray) and np.ndim(
            images) == 3 else images
        crops = []
        for i, img in enumerate(img_list):
            img = np.asarray(img)
            if img.ndim == 2:
                img = np.stack([img] * 3, -1)
            img = img[..., :3].astype(np.float32)
            if not valid[i]:
                crops.append(None)
                continue
            h, w = img.shape[:2]
            x1, y1, x2, y2 = np.round(boxes[i]).astype(int)
            x1, y1 = max(x1, 0), max(y1, 0)
            x2, y2 = min(x2, w), min(y2, h)
            if x2 <= x1 or y2 <= y1:
                valid[i] = False
                crops.append(None)
                continue
            # paste the 28x28 mask probabilities at FULL original resolution
            # (torchvision postprocess semantics, ref :628-631)
            full = paste_mask_np(np.asarray(out["masks"][i, 0], np.float32),
                                 boxes[i].astype(np.float64), h, w)
            soft = np.where(full < self.mask_thr, full ** 2, 1.0)
            crops.append((img * soft[..., None])[y1:y2, x1:x2])
        return crops, np.asarray(valid), {"scores": scores, "boxes": boxes}

    def __call__(self, img: np.ndarray):
        crops, valid, _ = self.batch([img])
        assert valid[0], "Preproc5: low detection score"
        return np.clip(crops[0], 0, 255).astype(np.uint8)


class PreprocCombined:
    """Keypoints + mask: mask-multiplied image, then aligned head crop
    (ref ``:658-738``)."""

    def __init__(self, keypoint_pipeline: "Preproc3", mask_pipeline: "Preproc4"):
        self.keypoint_pipeline = keypoint_pipeline
        self.mask_pipeline = mask_pipeline

    def __call__(self, img: np.ndarray):
        masked = self.mask_pipeline(img)
        return self.keypoint_pipeline(masked)

    def batch(self, images):
        crops, valid, _ = self.mask_pipeline.batch(images)
        usable = [c if v and c is not None else np.asarray(img)
                  for c, v, img in zip(crops, valid, images)]
        aligned, valid2, raw = self.keypoint_pipeline.batch(usable)
        return aligned, np.asarray(valid) & np.asarray(valid2), raw


# Dataset-version ablation pipelines (ref ``:322-610,746-795``): each reference
# variant is Preproc3 (aligned) or Preproc6 (bbox crop) hard-bound to a distinct
# mlruns keypoint checkpoint. Here the binding is a default ``loader`` resolved
# through ``configs.pipelines.keypoint_pipeline(variant)`` (env-overridable
# checkpoint paths) — constructing ``Preproc9()`` loads a different checkpoint
# than ``Preproc3()``; passing ``model_fn``/``loader`` explicitly still wins.


def _variant_loader(variant: str):
    """Deferred per-variant detector loader (mirrors the reference's
    ``models_init`` reload-on-unpickle contract)."""
    def load():
        from configs.pipelines import keypoint_pipeline

        return keypoint_pipeline(variant)

    load.variant = variant
    return load


class _VariantBinding:
    """Mixin: when neither ``model_fn`` nor ``loader`` is given, bind the
    class's checkpoint variant."""

    CKPT_VARIANT = "prod"

    def __init__(self, model_fn=None, loader=None, **kwargs):
        if model_fn is None and loader is None:
            loader = _variant_loader(self.CKPT_VARIANT)
        super().__init__(model_fn=model_fn, loader=loader, **kwargs)


class Preproc7(_VariantBinding, Preproc3):
    """Aligned head crop, dataset-v2 ablation checkpoint (ref ``:364-416``)."""

    CKPT_VARIANT = "v2"


class Preproc8(_VariantBinding, Preproc6):
    """Head bbox crop, dataset-v2 ablation checkpoint (ref ``:322-361``)."""

    CKPT_VARIANT = "v2"


class Preproc9(_VariantBinding, Preproc3):
    """Aligned head crop, dataset-v3 ablation checkpoint (ref ``:461-513``)."""

    CKPT_VARIANT = "v3"


class Preproc10(_VariantBinding, Preproc6):
    """Head bbox crop, dataset-v3 ablation checkpoint (ref ``:419-458``)."""

    CKPT_VARIANT = "v3"


class Preproc11(_VariantBinding, Preproc3):
    """Aligned head crop, dataset-v4 ablation checkpoint (ref ``:558-610``)."""

    CKPT_VARIANT = "v4"


class Preproc12(_VariantBinding, Preproc6):
    """Head bbox crop, dataset-v4 ablation checkpoint (ref ``:516-555``)."""

    CKPT_VARIANT = "v4"


class Preproc13(_VariantBinding, Preproc6):
    """Head bbox crop on the production keypoint checkpoint (ref ``:746-795``
    binds the same epoch=14 checkpoint as Preproc6)."""

    CKPT_VARIANT = "prod"


class IdentityPreproc:
    """Passthrough (ref ``:741-743``)."""

    def __call__(self, img):
        return img

    def batch(self, images):
        arr = [np.asarray(i) for i in images]
        return arr, np.ones(len(arr), bool), {}
