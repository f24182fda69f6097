"""Serving: streaming detect→align→embed over image files.

The production-deployment layer the reference lacks (its pipelines are eager
per-image loops, SURVEY.md §3.3/§3.4): a batched service that keeps the single
jitted device graph busy while the native C++ loader decodes the next batch on
host threads.

- decode: ``native.decode_batch`` (libjpeg thread pool, DCT downscale, letterbox
  geometry identical to the Python path) with PIL fallback;
- device: the same two-stage graph as ``bench.py`` (detector → top-1 landmarks →
  Pallas-warp alignment → FE embedding), fixed batch size, padded tail;
- overlap: the next batch decodes while the device crunches the current one
  (double-buffered host prefetch thread).

Typical use::

    service = EmbeddingService.from_checkpoints(det_fn, fe_fn, batch_size=64)
    for paths, emb, valid in service.stream(all_paths):
        ...

Validity mirrors the reference's assert-and-skip semantics: undecodable files
and low-score/degenerate detections come back ``valid=False`` instead of
raising (``transform_reproduce.py:41``).
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Callable, Iterable, Iterator, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .ops.homography import align_crop


DEFAULT_BASE_PTS = np.array([[70.0, 92.0], [154.0, 92.0], [112.0, 160.0]],
                            np.float32)


def _decode_batch_host(paths: Sequence[Path], input_size: tuple[int, int]):
    """Native decoder when available; PIL fallback otherwise."""
    from . import native

    if native.is_available() and all(
        str(p).lower().endswith((".jpg", ".jpeg")) for p in paths
    ):
        return native.decode_batch(list(paths), input_size)

    from PIL import Image

    from .utils.collate import letterbox_image

    H, W = input_size
    images = np.zeros((len(paths), H, W, 3), np.uint8)
    ok = np.zeros(len(paths), bool)
    scales = np.zeros(len(paths), np.float32)
    pads = np.zeros((len(paths), 2), np.float32)
    for i, p in enumerate(paths):
        try:
            img = np.array(Image.open(p).convert("RGB"))
        except Exception:
            continue
        canvas, s, (px, py) = letterbox_image(img, (H, W))
        images[i] = canvas
        ok[i] = True
        scales[i] = s
        pads[i] = (px, py)
    return images, ok, scales, pads


class EmbeddingService:
    """Streaming head-embedding service over image paths."""

    def __init__(
        self,
        detector_fn: Callable,
        embedder_fn: Callable,
        batch_size: int = 64,
        input_size: tuple[int, int] = (320, 320),
        crop_size: tuple[int, int] = (224, 224),
        base_pts: np.ndarray = DEFAULT_BASE_PTS,
        score_thr: float = 0.9,
        min_distance: float = 5.0,
        prefetch: int = 2,
        decode_threads: int = 0,
        mesh=None,
        warp_dtype=jnp.bfloat16,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``"data"`` axis —
        the batch is sharded across it (SPMD serving over ICI; every stage is
        per-example, so no collectives are needed and the Pallas kernels run
        on their local shard). ``batch_size`` must divide by the axis size.

        ``warp_dtype``: compute dtype of the alignment warp. The bfloat16
        default doubles MXU rate at ~0.4% pixel quantization; pass
        ``jnp.float32`` for the cv2-exact path in quality/eval deployments."""
        self.detector_fn = detector_fn
        self.embedder_fn = embedder_fn
        self.batch_size = batch_size
        self.input_size = tuple(input_size)
        self.crop_size = tuple(crop_size)
        self.base_pts = jnp.asarray(base_pts, jnp.float32)
        self.score_thr = score_thr
        self.min_distance = min_distance
        self.prefetch = prefetch
        self.decode_threads = decode_threads
        self.warp_dtype = warp_dtype
        self.mesh = mesh
        if mesh is None:
            self._embed = jax.jit(self._embed_impl)
        else:
            from jax.sharding import PartitionSpec as P

            from .parallel import shard_map_compat

            n = mesh.shape["data"]
            if batch_size % n:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by data axis {n}"
                )
            self._embed = jax.jit(shard_map_compat(
                self._embed_impl, mesh=mesh,
                in_specs=(P("data"), P("data")),
                out_specs=(P("data"), P("data")),
            ))

    # -- device graph -------------------------------------------------------
    def _embed_impl(self, images_u8, decode_ok):
        imgs = images_u8.astype(jnp.float32) / 255.0
        dets = self.detector_fn(imgs)
        scores = dets["scores"][:, 0]
        det_ok = dets["valid"][:, 0] & (scores > self.score_thr)
        # the reference rounds landmarks to the int pixel grid before the
        # distance check and alignment (ref preprocessor/__init__.py:181)
        kps = jnp.round(dets["keypoints"][:, 0, :, :2])
        d01 = jnp.linalg.norm(kps[:, 0] - kps[:, 1], axis=-1)
        d02 = jnp.linalg.norm(kps[:, 0] - kps[:, 2], axis=-1)
        d12 = jnp.linalg.norm(kps[:, 1] - kps[:, 2], axis=-1)
        kp_ok = (
            (d01 > self.min_distance)
            & (d02 > self.min_distance)
            & (d12 > self.min_distance)
        )
        crops = align_crop(imgs, kps, self.base_pts, self.crop_size,
                           compute_dtype=self.warp_dtype)
        emb = self.embedder_fn(crops)
        return emb, decode_ok & det_ok & kp_ok

    # -- streaming ----------------------------------------------------------
    def stream(
        self, paths: Iterable[str | Path]
    ) -> Iterator[tuple[list[Path], np.ndarray, np.ndarray]]:
        """Yield ``(batch_paths, embeddings (B, D), valid (B,))`` per batch.

        The tail batch is padded internally; only real entries are yielded.
        """
        paths = [Path(p) for p in paths]
        batches = [
            paths[i : i + self.batch_size]
            for i in range(0, len(paths), self.batch_size)
        ]
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def produce():
            try:
                for chunk in batches:
                    padded = list(chunk) + [chunk[-1]] * (
                        self.batch_size - len(chunk)
                    )
                    images, ok, _, _ = _decode_batch_host(
                        padded, self.input_size
                    )
                    q.put((chunk, images, ok))
            except BaseException as e:  # pragma: no cover
                q.put(e)
                return
            q.put(sentinel)

        threading.Thread(target=produce, daemon=True).start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            chunk, images, ok = item
            emb, valid = self._embed(jnp.asarray(images), jnp.asarray(ok))
            n = len(chunk)
            yield chunk, np.asarray(emb)[:n], np.asarray(valid)[:n]

    def embed_paths(self, paths: Sequence[str | Path]):
        """Convenience: embed everything, return ``(emb (N, D), valid (N,))``."""
        embs, valids = [], []
        for _, e, v in self.stream(paths):
            embs.append(e)
            valids.append(v)
        if not embs:
            return np.zeros((0, 512), np.float32), np.zeros(0, bool)
        return np.concatenate(embs), np.concatenate(valids)
