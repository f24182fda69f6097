"""Pallas NMS kernel (interpret mode on CPU) vs the pure-JAX reference."""

import numpy as np
import jax.numpy as jnp

from pets_face_recognition_tpu.ops.nms import nms
from pets_face_recognition_tpu.ops.pallas_nms import nms_keep_sorted, nms_keep_sorted_batch


def _rand(rng, n, size=60.0):
    xy = rng.uniform(0, size, (n, 2)).astype(np.float32)
    wh = rng.uniform(5, size / 2, (n, 2)).astype(np.float32)
    return np.concatenate([xy, xy + wh], axis=1)


def test_pallas_nms_matches_jax_reference(rng):
    for trial in range(3):
        boxes = _rand(rng, 128)
        scores = rng.uniform(0, 1, 128).astype(np.float32)
        order = np.argsort(-scores, kind="stable")
        sboxes = boxes[order]
        valid = np.ones(128, bool)

        keep_pallas = np.asarray(
            nms_keep_sorted(jnp.asarray(sboxes), jnp.asarray(valid), 0.5,
                            interpret=True)
        )
        idx, keep = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 128)
        kept_ref = set(np.asarray(idx)[np.asarray(keep)].tolist())
        kept_pallas = set(order[keep_pallas > 0].tolist())
        assert kept_pallas == kept_ref, f"trial {trial}"


def test_pallas_nms_respects_valid_mask(rng):
    boxes = _rand(rng, 16)
    valid = np.zeros(16, bool)
    valid[:4] = True
    keep = np.asarray(
        nms_keep_sorted(jnp.asarray(boxes), jnp.asarray(valid), 0.5,
                        interpret=True)
    )
    assert not keep[4:].any()


def test_pallas_nms_batch_chunked_grid_matches_single(rng):
    # G > NMS_GROUP_BLOCK (256) and not a multiple of it: exercises the
    # chunked-grid + zero-padding path of nms_keep_sorted_batch.
    G, K = 300, 32
    boxes = np.stack([_rand(rng, K) for _ in range(G)])
    order = np.argsort(-rng.uniform(0, 1, (G, K)), axis=1, kind="stable")
    boxes = np.take_along_axis(boxes, order[..., None], axis=1)
    valid = np.ones((G, K), bool)
    valid[::7, -3:] = False
    batch = np.asarray(nms_keep_sorted_batch(
        jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True))
    assert batch.shape == (G, K)
    for g in (0, 1, 17, 255, 256, 257, 299):
        single = np.asarray(nms_keep_sorted(
            jnp.asarray(boxes[g]), jnp.asarray(valid[g]), 0.5, interpret=True))
        np.testing.assert_array_equal(batch[g], single, err_msg=f"group {g}")


def test_pallas_nms_batch_matches_single(rng):
    G, K = 6, 64
    boxes = np.stack([_rand(rng, K) for _ in range(G)])
    order = np.argsort(-rng.uniform(0, 1, (G, K)), axis=1, kind="stable")
    boxes = np.take_along_axis(boxes, order[..., None], axis=1)
    valid = np.ones((G, K), bool)
    valid[:, -5:] = False
    batch = np.asarray(nms_keep_sorted_batch(
        jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True))
    for g in range(G):
        single = np.asarray(nms_keep_sorted(
            jnp.asarray(boxes[g]), jnp.asarray(valid[g]), 0.5, interpret=True))
        np.testing.assert_array_equal(batch[g], single, err_msg=f"group {g}")
