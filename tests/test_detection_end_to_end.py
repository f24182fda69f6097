"""Detection vertical slice: config → DetectionController → Trainer.fit → eval
metrics, on synthetic box data over the 8-device CPU mesh."""

import textwrap

import numpy as np
import pytest

from pets_face_recognition_tpu.engine import DetectionController, Trainer
from pets_face_recognition_tpu.parallel import create_mesh
from pets_face_recognition_tpu.utils import get_dict_wrapper

CONFIG = """
import numpy as np
import optax

from pets_face_recognition_tpu.losses import SumDetectionLoss
from pets_face_recognition_tpu.models.fpn import BackboneWithFPN
from pets_face_recognition_tpu.models.rcnn import GeneralizedRCNN, RCNNConfig
from pets_face_recognition_tpu.models.resnet import resnet18
from pets_face_recognition_tpu.data_loading import DataLoader
from pets_face_recognition_tpu.utils.collate import DetectionCollate

seed = 7
n_epochs = 1
train_batch_size = 8
test_batch_size = 8
image_size = (64, 64)


def model():
    cfg = RCNNConfig(
        num_classes=2,
        rpn_pre_nms_top_n_train=100, rpn_post_nms_top_n_train=64,
        rpn_pre_nms_top_n_test=64, rpn_post_nms_top_n_test=32,
        box_batch_size_per_image=32, box_detections_per_img=2,
        rpn_batch_size_per_image=64,
    )
    return GeneralizedRCNN(
        backbone=BackboneWithFPN(
            backbone=resnet18(features_only=True, frozen_stats=True)),
        cfg=cfg,
    )


def loss(config, m):
    return SumDetectionLoss(model=m)


def optimizer(config):
    return optax.sgd(0.01, momentum=0.9)


class _SynthBoxes:
    '''White squares on noise; GT box = the square.'''

    def __init__(self, n=32):
        rng = np.random.RandomState(seed)
        self.items = []
        for _ in range(n):
            img = rng.uniform(0, 0.3, (64, 64, 3)).astype(np.float32)
            x = rng.randint(4, 36)
            y = rng.randint(4, 36)
            w = rng.randint(12, 24)
            h = rng.randint(12, 24)
            img[y:y+h, x:x+w] = 1.0
            self.items.append(
                (img, {"boxes": np.array([[x, y, x+w, y+h]], np.float32),
                       "labels": np.array([0], np.int32)})
            )

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


_collate = DetectionCollate(image_size, max_boxes=2)
_ds = _SynthBoxes()


def train_dataloader():
    return DataLoader(_ds, train_batch_size, shuffle=True, seed=seed,
                      drop_last=True, collate_fn=_collate, num_workers=0)


def val_dataloader():
    return DataLoader(_ds, test_batch_size, shuffle=False, drop_last=True,
                      collate_fn=_collate, num_workers=0)


output = r"{output}"
"""


@pytest.fixture
def det_config(tmp_path):
    out = tmp_path / "run"
    out.mkdir()
    f = tmp_path / "det_cfg.py"
    f.write_text(textwrap.dedent(CONFIG.replace("{output}", str(out))))
    return get_dict_wrapper(f)


def test_detection_fit_and_eval(det_config):
    mesh = create_mesh()
    controller = DetectionController(det_config, mesh=mesh)
    controller.with_masks = False
    trainer = Trainer(config=det_config, mesh=mesh, enable_checkpointing=False,
                      default_root_dir=det_config.output)
    state = trainer.fit(controller)
    assert int(state.step) == 4  # 32 imgs / bs 8 = 4 steps

    results = trainer.validate(controller, state)
    metrics = results["val"]
    # untrained-ish: just assert the full metric surface exists and is finite
    for key in ("Mean IoU", "Median IoU", "AP 50", "AP 70", "AP 90"):
        assert key in metrics

    # loss must decrease over a few more epochs of this easy task
    trainer2 = Trainer(config=det_config, mesh=mesh, max_epochs=3,
                       enable_checkpointing=False,
                       default_root_dir=det_config.output)
    controller2 = DetectionController(det_config, mesh=mesh)
    controller2.with_masks = False
    import jax
    from pets_face_recognition_tpu.parallel import shard_batch

    state2 = controller2.init_state(jax.random.PRNGKey(0),
                                    next(iter(controller2.train_dataloader())))
    step = controller2.make_train_step()
    losses = []
    for epoch in range(6):
        for batch in controller2.train_dataloader():
            db = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
            state2, m = step(state2, db, jax.random.PRNGKey(epoch))
            losses.append(float(m["loss"]))
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses
