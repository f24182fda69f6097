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


def test_int8_fpn_and_rpn_head_close_to_float():
    """FPN + RPN-head quant twins: same params tree, outputs cosine>0.99."""
    import flax.linen as nn

    from pets_face_recognition_tpu.models.fpn import FPN
    from pets_face_recognition_tpu.models.rpn import RPNHead

    rng = jax.random.PRNGKey(6)
    feats = {
        "c2": jax.random.normal(jax.random.PRNGKey(7), (2, 16, 16, 32)),
        "c3": jax.random.normal(jax.random.PRNGKey(8), (2, 8, 8, 64)),
    }
    kw = dict(out_channels=64, in_levels=("c2", "c3"))
    f_float = FPN(**kw)
    f_cal = FPN(**kw, quant="calibrate")
    f_int8 = FPN(**kw, quant="int8")
    v = f_cal.init(rng, feats)
    pf = jax.tree_util.tree_map(lambda a: a.shape,
                                f_float.init(rng, feats)["params"])
    pq = jax.tree_util.tree_map(lambda a: a.shape, v["params"])
    assert pf == pq  # bias + kernel trees identical → converters untouched
    ref = f_float.apply({"params": v["params"]}, feats)
    out = f_int8.apply(v, feats)
    for p in ref:
        assert _cos(ref[p], out[p]) > 0.99, p

    pyramids = {k: jnp.asarray(x, jnp.float32) for k, x in ref.items()}
    h_float = RPNHead(num_anchors=3)
    h_cal = RPNHead(num_anchors=3, quant="calibrate")
    h_int8 = RPNHead(num_anchors=3, quant="int8")
    vh = h_cal.init(rng, pyramids)
    phf = jax.tree_util.tree_map(lambda a: a.shape,
                                 h_float.init(rng, pyramids)["params"])
    phq = jax.tree_util.tree_map(lambda a: a.shape, vh["params"])
    assert phf == phq
    lo_ref, de_ref = h_float.apply({"params": vh["params"]}, pyramids)
    lo, de = h_int8.apply(vh, pyramids)
    assert _cos(lo_ref, lo) > 0.99
    assert _cos(de_ref, de) > 0.99


def test_int8_keypoint_head_close_to_float():
    """Keypoint-head quant twin: same params tree; heatmap logits cosine>0.99
    and the argmax cell (what the decode consumes) agrees on ≥90% of RoIs."""
    from pets_face_recognition_tpu.models.roi_heads import KeypointHead

    rng = jax.random.PRNGKey(9)
    x = jax.random.normal(jax.random.PRNGKey(10), (8, 14, 14, 256))
    kw = dict(num_keypoints=3, channels=64)
    h_float = KeypointHead(**kw)
    h_cal = KeypointHead(**kw, quant="calibrate")
    h_int8 = KeypointHead(**kw, quant="int8")
    v = h_cal.init(rng, x)
    pf = jax.tree_util.tree_map(lambda a: a.shape,
                                h_float.init(rng, x)["params"])
    pq = jax.tree_util.tree_map(lambda a: a.shape, v["params"])
    assert pf == pq  # converters untouched
    ref = h_float.apply({"params": v["params"]}, x)
    out = h_int8.apply(v, x)
    assert _cos(ref, out) > 0.99
    r = np.asarray(ref, np.float32).reshape(8, -1, ref.shape[-1])
    o = np.asarray(out, np.float32).reshape(8, -1, out.shape[-1])
    # random-init heatmaps are nearly flat, so exact argmax agreement is the
    # wrong bar; instead require every disagreement to be a NEAR-TIE in the
    # float logits (the int8 path may only flip cells the float path could
    # not tell apart)
    ra, oa = r.argmax(axis=1), o.argmax(axis=1)
    span = r.max(axis=1) - r.min(axis=1)
    gap = (np.take_along_axis(r, ra[:, None, :], 1)
           - np.take_along_axis(r, oa[:, None, :], 1))[:, 0, :]
    assert np.all(gap <= 0.05 * span + 1e-6), (gap / span)


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
