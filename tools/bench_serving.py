"""End-to-end serving benchmark: files → decode → detect → align → embed.

Unlike ``bench.py`` (device-only, pre-staged batches), this drives the
production ``serving.EmbeddingService`` over real JPEG files: the native C++
decoder (libjpeg thread pool) double-buffers against the jitted device graph,
so the number includes host IO, decode, letterbox, H2D transfer, and padded
tails — the throughput a deployment actually sees.

Prints one JSON line. Usage:
    python tools/bench_serving.py [--images 1024] [--batch-size 128]

CAVEAT for this image: the TPU is reached through the axon tunnel, so each
batch's host→device image upload (~39 MB at B=128/320²) crosses a network
link at ~35 MB/s — measured 106 crops/s end-to-end against bench.py's ~4100
device-side. On real hardware with local PCIe/DMA the host pipeline (native
decode ≫ 5k img/s) and the device graph are the limits, not the transfer;
treat this tool's absolute number here as a tunnel-bandwidth reading.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=1024)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--image-size", type=int, default=320)
    ap.add_argument("--detector", choices=("mobile", "resnet50"),
                    default="mobile")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from bench import build_serving_models
    from pets_face_recognition_tpu.serving import EmbeddingService
    from pets_face_recognition_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    detector, embedder, base_pts, _ = build_serving_models(
        detector_kind=args.detector)
    B, S = args.batch_size, args.image_size
    rng = jax.random.PRNGKey(0)
    probe = jnp.zeros((B, S, S, 3), jnp.float32)
    det_vars = jax.jit(lambda r, x: detector.init(r, x, train=False))(rng, probe)
    emb_vars = jax.jit(embedder.init)(rng, jnp.zeros((B, 224, 224, 3),
                                                     jnp.float32))

    def detector_fn(imgs):
        return detector.apply(det_vars, imgs, train=False)

    def embedder_fn(crops):
        return embedder.apply(emb_vars, crops, train=False)

    service = EmbeddingService(
        detector_fn, embedder_fn, batch_size=B, input_size=(S, S),
        base_pts=np.asarray(base_pts), score_thr=0.0, min_distance=0.0,
    )

    with tempfile.TemporaryDirectory() as td:
        rs = np.random.RandomState(0)
        paths = []
        for i in range(args.images):
            img = rs.randint(0, 255, (480, 640, 3)).astype(np.uint8)
            p = Path(td) / f"{i}.jpg"
            Image.fromarray(img).save(p, quality=90)
            paths.append(p)

        # warm up compiles on the first pass, measure the second
        emb, valid = service.embed_paths(paths[: 2 * B])
        t0 = time.perf_counter()
        emb, valid = service.embed_paths(paths)
        dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "serving_crops_per_sec_end_to_end",
        "value": round(args.images / dt, 2),
        "unit": "crops/s",
        "images": args.images,
        "batch_size": B,
        "detector": args.detector,
        "embedding_dim": int(emb.shape[1]),
    }))


if __name__ == "__main__":
    main()
