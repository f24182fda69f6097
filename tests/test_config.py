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
