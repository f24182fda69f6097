"""Config-system contract tests (reference `utils/__init__.py:13-72` semantics)."""

import textwrap

from pets_face_recognition_tpu.utils import Config, DictWrapper, get_config, get_dict_wrapper


def _write_cfg(tmp_path, body, name="cfg.py"):
    p = tmp_path / name
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_executable_config_exposes_public_globals(tmp_path):
    path = _write_cfg(
        tmp_path,
        """
        _hidden = 1
        seed = 123
        train_batch_size = 32
        def model():
            return "model"
        values = [1, 2, 3]
        """,
    )
    cfg = get_config(path)
    assert cfg.seed == 123
    assert cfg["train_batch_size"] == 32
    assert cfg.model() == "model"
    assert "values" in cfg
    assert "_hidden" not in cfg
    assert cfg.config_path == path


def test_config_is_singleton_reset_per_load(tmp_path):
    p1 = _write_cfg(tmp_path, "a = 1\n", "c1.py")
    p2 = _write_cfg(tmp_path, "b = 2\n", "c2.py")
    c1 = get_config(p1)
    assert c1.a == 1
    c2 = get_config(p2)
    assert c2 is Config()
    assert c2.b == 2
    assert "a" not in c2  # reset between loads


def test_dict_wrapper_read_write():
    w = DictWrapper({"x": 1})
    w.y = 2
    w["z"] = 3
    assert (w.x, w["y"], w.z) == (1, 2, 3)
    assert set(w.keys()) == {"x", "y", "z"}
    assert len(w) == 3
    assert w.get("missing", "d") == "d"


def test_get_dict_wrapper_is_not_singleton(tmp_path):
    p = _write_cfg(tmp_path, "v = 7\n")
    w1 = get_dict_wrapper(p)
    w2 = get_dict_wrapper(p)
    assert w1 is not w2
    assert w1.v == w2.v == 7


def test_configs_can_import_each_other_side_effect_free(tmp_path):
    # Reference configs construct objects at import time (SURVEY.md §2.2); loading
    # twice must re-execute.
    path = _write_cfg(
        tmp_path,
        """
        import itertools
        _counter = itertools.count()
        value = next(_counter)
        """,
    )
    assert get_dict_wrapper(path).value == 0
    assert get_dict_wrapper(path).value == 0


def test_pipelines_config_unwraps_loss_checkpoint(tmp_path, monkeypatch):
    """configs/pipelines.py must strip the SumDetectionLoss 'model' prefix
    that training writes (regression: prepare_tables failed to load
    smoke-trained checkpoints)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pets_face_recognition_tpu.engine.checkpoint import save_checkpoint
    from pets_face_recognition_tpu.engine.train_state import TrainState
    from pets_face_recognition_tpu.models.rcnn import (
        keypointrcnn_resnet50_fpn,
    )
    from pets_face_recognition_tpu.utils import get_dict_wrapper
    import optax

    model = keypointrcnn_resnet50_fpn(num_classes=2, num_keypoints=3,
                                      box_detections_per_img=1)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    # emulate the training tree: params under the loss wrapper's 'model' key
    wrapped = {
        "params": {"model": variables["params"]},
        "batch_stats": {"model": variables.get("batch_stats", {})},
    }
    tx = optax.sgd(0.1)
    state = TrainState.create(
        model.apply, wrapped, tx
    )
    ckpt_dir = tmp_path / "checkpoints"
    save_checkpoint(ckpt_dir, state, epoch=0)

    monkeypatch.setenv("PFR_KEYPOINT_CKPT", str(ckpt_dir))
    cfg = get_dict_wrapper("configs/pipelines.py")
    fn = cfg.keypoint_pipeline()
    out = fn(imgs)
    assert out["keypoints"].shape[0] == 1
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_pipeline_quant_fallback_unsupported_components(tmp_path, monkeypatch,
                                                        capsys):
    """A quant mode whose selected components the factory's model doesn't
    consume must fall back to FLOAT with a printed notice instead of building
    a quant-less PTQ twin that raises at load time (ADVICE r4 #1/#2;
    regression for 8afcd3c).

    mask R-CNN has no keypoint head, so PFR_QUANT_COMPONENTS=kp_head under
    calibrate mode must serve the plain float path.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pets_face_recognition_tpu.engine.checkpoint import save_checkpoint
    from pets_face_recognition_tpu.engine.train_state import TrainState
    from pets_face_recognition_tpu.models.rcnn import maskrcnn_resnet50_fpn
    from pets_face_recognition_tpu.utils import get_dict_wrapper

    model = maskrcnn_resnet50_fpn(num_classes=2, box_detections_per_img=3)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    state = TrainState.create(model.apply, {
        "params": {"model": variables["params"]},
        "batch_stats": {"model": variables.get("batch_stats", {})},
    }, optax.sgd(0.1))
    ckpt_dir = tmp_path / "checkpoints"
    save_checkpoint(ckpt_dir, state, epoch=0)

    monkeypatch.setenv("PFR_MASK_CKPT", str(ckpt_dir))
    monkeypatch.setenv("PFR_QUANT_MODE", "calibrate")
    monkeypatch.setenv("PFR_QUANT_COMPONENTS", "kp_head")
    monkeypatch.setenv("PFR_QUANT_STATE", str(tmp_path / "qs.pkl"))
    cfg = get_dict_wrapper("configs/pipelines.py")
    fn = cfg.mask_pipeline()
    out = fn(imgs)
    assert np.isfinite(np.asarray(out["scores"])).all()
    printed = capsys.readouterr().out
    assert "serving FLOAT" in printed


def test_mobile_pipeline_quant_fallback_detector_unsupported(tmp_path,
                                                             monkeypatch,
                                                             capsys):
    """The mobile keypoint factory's MBv3 trunk has no int8 path
    (supports=("kp_head",)): selecting only the detector component under a
    quant mode must serve FLOAT with a printed notice (ADVICE r4 #1/#2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pets_face_recognition_tpu.engine.checkpoint import save_checkpoint
    from pets_face_recognition_tpu.engine.train_state import TrainState
    from pets_face_recognition_tpu.models.rcnn import (
        mobile_net_v3_large_keypoint_rcnn,
    )
    from pets_face_recognition_tpu.utils import get_dict_wrapper

    model = mobile_net_v3_large_keypoint_rcnn()
    # 320x320 (the production serving size): at 64px the mobile pyramid has
    # fewer anchors than the default rpn_pre_nms_top_n_test budget
    imgs = jnp.zeros((1, 320, 320, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    state = TrainState.create(model.apply, {
        "params": {"model": variables["params"]},
        "batch_stats": {"model": variables.get("batch_stats", {})},
    }, optax.sgd(0.1))
    ckpt_dir = tmp_path / "checkpoints"
    save_checkpoint(ckpt_dir, state, epoch=0)

    monkeypatch.setenv("PFR_KEYPOINT_CKPT", str(ckpt_dir))
    monkeypatch.setenv("PFR_KEYPOINT_ARCH", "mobile")
    monkeypatch.setenv("PFR_QUANT_MODE", "calibrate")
    monkeypatch.setenv("PFR_QUANT_COMPONENTS", "detector")
    monkeypatch.setenv("PFR_QUANT_STATE", str(tmp_path / "qs.pkl"))
    cfg = get_dict_wrapper("configs/pipelines.py")
    fn = cfg.keypoint_pipeline()
    out = fn(imgs)
    assert np.isfinite(np.asarray(out["scores"])).all()
    printed = capsys.readouterr().out
    assert "serving FLOAT" in printed
