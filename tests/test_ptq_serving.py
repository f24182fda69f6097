"""PTQ serving workflow (models/ptq.py): calibrate → save → load → int8.

The rank-safety drive (tools/rank_safety_drive.sh) runs the production
retrieval chain through this machinery; these tests pin its mechanics on CPU:

- the calibrate forward is EXACTLY the float forward (bit-equal embeddings);
- the saved/reloaded quant state serves an int8 path whose embeddings stay
  cosine-close to float;
- running-max calibration across multiple batches monotonically widens scales;
- ``PTQModelFn`` dispatches per PFR_QUANT_MODE and persists state at exit
  paths used by configs/retrieval_common.py.
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pets_face_recognition_tpu.models import ptq
from pets_face_recognition_tpu.models.embedder import EmbeddingModel
from pets_face_recognition_tpu.models.resnet import resnet18


def _build_fn(mode):
    return EmbeddingModel(
        backbone=resnet18(num_classes=0, quant=mode), embedding_dim=32)


@pytest.fixture
def trained_like_params():
    model = _build_fn(None)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(3), x)
    return model, variables


def test_calibrate_forward_is_float_forward(trained_like_params):
    model, variables = trained_like_params
    x = jnp.asarray(np.random.RandomState(1).rand(4, 64, 64, 3), jnp.float32)
    float_out = model.apply(variables, x, train=False)

    runner = ptq.PTQServing(
        "emb", _build_fn, variables["params"],
        variables.get("batch_stats", {}),
        example=np.zeros((1, 64, 64, 3), np.float32))
    calib_out = runner.calibrate(x)
    # same math; QuantConv calibrate lowers through lax.conv directly while
    # nn.Conv fuses slightly differently -> f32 rounding noise only
    # (measured 1e-6 abs on CPU)
    np.testing.assert_allclose(np.asarray(calib_out), np.asarray(float_out),
                               rtol=1e-4, atol=1e-5)


def test_int8_roundtrip_through_state_file(trained_like_params, tmp_path):
    model, variables = trained_like_params
    rng = np.random.RandomState(2)
    calib = jnp.asarray(rng.rand(8, 64, 64, 3), jnp.float32)
    x = jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32)

    runner = ptq.PTQServing(
        "emb", _build_fn, variables["params"],
        variables.get("batch_stats", {}),
        example=np.zeros((1, 64, 64, 3), np.float32))
    runner.calibrate(calib)
    state_path = tmp_path / "qs.pkl"
    ptq._REGISTRY.clear()
    ptq.register(runner)
    ptq.save_quant_state(state_path)

    # fresh runner (new process analog) loads the persisted state
    runner2 = ptq.PTQServing(
        "emb", _build_fn, variables["params"],
        variables.get("batch_stats", {}),
        example=np.zeros((1, 64, 64, 3), np.float32))
    runner2.load_quant(ptq.load_quant_state("emb", state_path))

    float_out = np.asarray(model.apply(variables, x, train=False))
    int8_out = np.asarray(runner2.serve_fn()(x))
    cos = np.sum(float_out * int8_out, -1) / (
        np.linalg.norm(float_out, axis=-1) * np.linalg.norm(int8_out, axis=-1)
    )
    assert cos.min() > 0.99, cos


def test_running_max_calibration_widens_scales(trained_like_params):
    _, variables = trained_like_params
    runner = ptq.PTQServing(
        "emb", _build_fn, variables["params"],
        variables.get("batch_stats", {}),
        example=np.zeros((1, 64, 64, 3), np.float32))
    runner.calibrate(jnp.full((1, 64, 64, 3), 0.1, jnp.float32))
    scales_small = jax.tree_util.tree_map(np.asarray, runner.quant_numpy())
    runner.calibrate(jnp.full((1, 64, 64, 3), 1.0, jnp.float32))
    scales_big = runner.quant_numpy()

    def _flat_scales(tree):
        return {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(tree)
                if "scale" in jax.tree_util.keystr(k)
                and "w_scale" not in jax.tree_util.keystr(k)}

    small, big = _flat_scales(scales_small), _flat_scales(scales_big)
    assert small and big.keys() == small.keys()
    grew = [np.all(big[k] >= small[k] - 1e-7) for k in small]
    assert all(grew)
    assert any(np.any(big[k] > small[k]) for k in small)


def test_quant_mode_env_validation(monkeypatch):
    monkeypatch.setenv(ptq.QUANT_MODE_ENV, "bogus")
    with pytest.raises(ValueError):
        ptq.quant_mode()
    monkeypatch.setenv(ptq.QUANT_MODE_ENV, "int8")
    assert ptq.quant_mode() == "int8"
    monkeypatch.setenv(ptq.QUANT_COMPONENTS_ENV, "embedder, kp_head")
    assert ptq.quant_components() == {"embedder", "kp_head"}
    monkeypatch.setenv(ptq.QUANT_COMPONENTS_ENV, "embedder,typo")
    with pytest.raises(ValueError):
        ptq.quant_components()


def test_int8_mode_requires_state_file(tmp_path, monkeypatch,
                                       trained_like_params):
    _, variables = trained_like_params
    monkeypatch.setenv(ptq.QUANT_STATE_ENV, str(tmp_path / "missing.pkl"))
    runner = ptq.PTQServing(
        "emb", _build_fn, variables["params"],
        variables.get("batch_stats", {}),
        example=np.zeros((1, 64, 64, 3), np.float32))
    with pytest.raises(FileNotFoundError):
        ptq.PTQModelFn(runner, "int8")


def test_ptq_model_fn_calibrate_then_int8(tmp_path, monkeypatch,
                                          trained_like_params):
    model, variables = trained_like_params
    state_path = tmp_path / "qs.pkl"
    monkeypatch.setenv(ptq.QUANT_STATE_ENV, str(state_path))
    x = jnp.asarray(np.random.RandomState(5).rand(2, 64, 64, 3), jnp.float32)

    def make_runner():
        return ptq.PTQServing(
            "emb", _build_fn, variables["params"],
            variables.get("batch_stats", {}),
            example=np.zeros((1, 64, 64, 3), np.float32))

    ptq._REGISTRY.clear()
    fn = ptq.PTQModelFn(make_runner(), "calibrate")
    out_calib = np.asarray(fn(x))
    ptq.save_quant_state()  # what the atexit hook does
    assert state_path.exists()
    with open(state_path, "rb") as f:
        assert "emb" in pickle.load(f)

    fn8 = ptq.PTQModelFn(make_runner(), "int8")
    out_int8 = np.asarray(fn8(x))
    cos = np.sum(out_calib * out_int8, -1) / (
        np.linalg.norm(out_calib, axis=-1)
        * np.linalg.norm(out_int8, axis=-1))
    assert cos.min() > 0.99
