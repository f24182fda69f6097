"""EmbeddingService streaming over files with tiny fake device fns."""

import numpy as np
import pytest
from PIL import Image
import jax.numpy as jnp

from pets_face_recognition_tpu.serving import EmbeddingService


@pytest.fixture
def jpeg_dir(tmp_path, rng):
    paths = []
    for i in range(10):
        img = rng.randint(0, 255, (100, 120, 3)).astype(np.uint8)
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(img).save(p)
        paths.append(p)
    return paths


def _fake_detector(images):
    b = images.shape[0]
    return {
        "scores": jnp.full((b, 1), 0.99),
        "valid": jnp.ones((b, 1), bool),
        "keypoints": jnp.broadcast_to(
            jnp.asarray([[[100.0, 100.0, 1.0], [180.0, 102.0, 1.0],
                          [140.0, 160.0, 1.0]]]),
            (b, 1, 3, 3),
        ),
        "boxes": jnp.zeros((b, 1, 4)),
        "labels": jnp.ones((b, 1), jnp.int32),
    }


def _fake_embedder(crops):
    # deterministic function of the crop so embeddings differ per image
    return crops.mean(axis=(1, 2))  # (B, 3)


def test_stream_batches_and_validity(jpeg_dir, tmp_path):
    bad = tmp_path / "broken.jpg"
    bad.write_bytes(b"nope")
    paths = list(jpeg_dir) + [bad]

    service = EmbeddingService(
        _fake_detector, _fake_embedder, batch_size=4, input_size=(160, 160),
        score_thr=0.5, min_distance=1.0,
    )
    seen_paths, emb, valid = [], [], []
    for chunk, e, v in service.stream(paths):
        seen_paths.extend(chunk)
        emb.append(e)
        valid.append(v)
    emb = np.concatenate(emb)
    valid = np.concatenate(valid)

    assert seen_paths == paths  # order preserved incl. tail batch
    assert emb.shape == (11, 3)
    assert valid[:10].all()
    assert not valid[10]  # broken file flagged, not raised
    # distinct images produce distinct embeddings
    assert len({tuple(np.round(e, 4)) for e in emb[:10]}) == 10


def test_embed_paths_concatenates(jpeg_dir):
    service = EmbeddingService(
        _fake_detector, _fake_embedder, batch_size=3, input_size=(160, 160),
        score_thr=0.5, min_distance=1.0,
    )
    emb, valid = service.embed_paths(jpeg_dir)
    assert emb.shape == (10, 3) and valid.shape == (10,)
    assert valid.all()


def test_low_score_detections_flagged(jpeg_dir):
    def weak_detector(images):
        out = _fake_detector(images)
        out["scores"] = jnp.full((images.shape[0], 1), 0.1)
        return out

    service = EmbeddingService(
        weak_detector, _fake_embedder, batch_size=4, input_size=(160, 160),
        score_thr=0.9,
    )
    _, valid = service.embed_paths(jpeg_dir)
    assert not valid.any()


def test_sharded_serving_matches_single_device(jpeg_dir):
    """mesh= shards the batch over the 8 virtual devices (SPMD serving);
    results must match the unsharded service exactly."""
    import jax
    from pets_face_recognition_tpu.parallel import create_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = create_mesh((len(jax.devices()),), ("data",))

    plain = EmbeddingService(
        _fake_detector, _fake_embedder, batch_size=8, input_size=(160, 160),
        score_thr=0.5, min_distance=1.0,
    )
    sharded = EmbeddingService(
        _fake_detector, _fake_embedder, batch_size=8, input_size=(160, 160),
        score_thr=0.5, min_distance=1.0, mesh=mesh,
    )
    e1, v1 = plain.embed_paths(jpeg_dir)
    e2, v2 = sharded.embed_paths(jpeg_dir)
    np.testing.assert_allclose(e1, e2, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(v1, v2)


def test_sharded_serving_rejects_indivisible_batch():
    import jax
    from pets_face_recognition_tpu.parallel import create_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = create_mesh((len(jax.devices()),), ("data",))
    with pytest.raises(ValueError):
        EmbeddingService(_fake_detector, _fake_embedder, batch_size=9,
                         mesh=mesh)
