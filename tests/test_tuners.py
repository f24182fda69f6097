"""Batch-size / LR tuner smoke tests on the toy FE task."""

import textwrap

import numpy as np
import pytest

from pets_face_recognition_tpu.engine import Controller
from pets_face_recognition_tpu.utils import get_dict_wrapper
from pets_face_recognition_tpu.utils.tuners import find_optimal_init_lr

from tests.test_fe_end_to_end import CONFIG_TEMPLATE


@pytest.fixture
def toy_config(tmp_path):
    out = tmp_path / "run"
    out.mkdir()
    f = tmp_path / "cfg.py"
    f.write_text(textwrap.dedent(
        CONFIG_TEMPLATE.replace("{output}", str(out))
        .replace("n_epochs = 25", "n_epochs = 1")
    ))
    return get_dict_wrapper(f)


def test_lr_range_test_returns_reasonable_lr(toy_config):
    controller = Controller(toy_config)
    lr = find_optimal_init_lr(controller, toy_config.train_dataloader(),
                              min_lr=1e-5, max_lr=1.0, num_steps=15)
    assert 1e-7 < lr < 1.0
    assert np.isfinite(lr)
