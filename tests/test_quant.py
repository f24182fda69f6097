"""int8 PTQ serving path (models/quant.py): tree compat + numeric error bounds.

The int8 path is TPU-native serving headroom with no reference counterpart
(the reference serves float32 torch models); these tests pin

1. checkpoint compatibility: a quantized ResNet declares the SAME params tree
   as the float one (torchvision converters keep working unchanged);
2. the calibrate → int8 twin flow: calibration snapshots kernels/scales, the
   int8 twin consumes them;
3. numeric fidelity: per-channel int8 weights + per-tensor int8 activations
   keep backbone features and FE embeddings within the standard PTQ error
   class (cosine > 0.99 on random-init networks, which are the WORST case —
   trained ResNets have more peaked, quantization-friendlier activations).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pets_face_recognition_tpu.models import resnet18, resnet50, resnet50_embedder
from pets_face_recognition_tpu.models.quant import quantize_symmetric


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_quantize_symmetric_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8).astype(np.float32))
    s = jnp.max(jnp.abs(x))
    xq = quantize_symmetric(x, s)
    assert xq.dtype == jnp.int8
    back = np.asarray(xq, np.float32) * float(s) / 127.0
    assert np.max(np.abs(back - np.asarray(x))) <= float(s) / 127.0 * 0.5 + 1e-6


@pytest.mark.parametrize("factory", [resnet18, resnet50])
def test_quant_params_tree_matches_float(factory):
    """Same params tree → torch checkpoint converters work unchanged."""
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    v_float = factory(features_only=True).init(rng, x, train=False)
    v_cal = factory(features_only=True, quant="calibrate").init(
        rng, x, train=False)
    pf = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)),
                                v_float["params"])
    pq = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)),
                                v_cal["params"])
    assert jax.tree_util.tree_structure(pf) == jax.tree_util.tree_structure(pq)
    assert pf == pq
    assert "quant" in v_cal  # int8 kernels + scales live in their own collection


def test_int8_backbone_close_to_float():
    """calibrate→int8 twin flow on ResNet-18: features stay cosine>0.99."""
    rng = jax.random.PRNGKey(1)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    m_float = resnet18(features_only=True)
    m_cal = resnet18(features_only=True, quant="calibrate")
    m_int8 = resnet18(features_only=True, quant="int8")

    v = m_cal.init(rng, x, train=False)  # init IS the first calibration pass
    # a second calibration batch folds into the running max
    x2 = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3)) * 1.5
    _, upd = m_cal.apply(v, x2, train=False, mutable=["quant"])
    v = {**v, "quant": upd["quant"]}

    ref = m_float.apply({k: v[k] for k in v if k != "quant"}, x, train=False)
    out = m_int8.apply(v, x, train=False)
    for lvl in ("c2", "c3", "c4", "c5"):
        c = _cos(ref[lvl], out[lvl])
        assert c > 0.99, (lvl, c)


def test_int8_embedder_embedding_drift():
    """FE trunk int8: embeddings of distinct crops keep cosine>0.99 to float
    and preserve their pairwise-similarity ordering (the retrieval contract)."""
    rng = jax.random.PRNGKey(4)
    crops = jax.random.uniform(jax.random.PRNGKey(5), (4, 64, 64, 3))
    e_float = resnet50_embedder(embedding_dim=32)
    e_cal = resnet50_embedder(embedding_dim=32, quant="calibrate")
    e_int8 = resnet50_embedder(embedding_dim=32, quant="int8")

    v = e_cal.init(rng, crops, train=False)
    ref = np.asarray(e_float.apply({k: v[k] for k in v if k != "quant"},
                                   crops, train=False))
    out = np.asarray(e_int8.apply(v, crops, train=False))
    for i in range(len(crops)):
        assert _cos(ref[i], out[i]) > 0.99

    def norm(m):
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    sim_ref = norm(ref) @ norm(ref).T
    sim_out = norm(out) @ norm(out).T
    # pairwise cosine similarities move by less than the retrieval ensemble's
    # decision granularity (thresholds are spaced ≥0.05 apart,
    # generate_tsv_to_reproduce1.py). Random-init embeddings are near-ties
    # (spread ~1e-3) so rank order itself is not a meaningful assertion here;
    # trained embeddings separate by ≥1e-1.
    iu = np.triu_indices(len(crops), k=1)
    assert np.max(np.abs(sim_ref[iu] - sim_out[iu])) < 0.01
