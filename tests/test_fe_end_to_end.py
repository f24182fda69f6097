"""End-to-end FE vertical slice: config file → Controller → Trainer.fit on an
8-device CPU mesh → verification metrics → checkpoint/resume.

This is the minimum slice of SURVEY.md §7.2, driven exactly like
``python main.py --config ...`` would drive it.
"""

import textwrap

import numpy as np
import pytest

from pets_face_recognition_tpu.engine import Controller, Trainer, latest_checkpoint
from pets_face_recognition_tpu.parallel import create_mesh
from pets_face_recognition_tpu.utils import get_dict_wrapper

CONFIG_TEMPLATE = """
import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import optax

from pets_face_recognition_tpu.losses import SoftmaxBasedMetricLearning
from pets_face_recognition_tpu.data_loading import DataLoader, PairGenerator

seed = 123
n_classes = 8
n_per_class = 6
n_epochs = 25
train_batch_size = 16
test_batch_size = 16
emb_size = 32
thrs = (0.5,)
far_thr = ()
k = (1, 5)
output = r"{output}"


class _TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(16, (3, 3), strides=(2, 2))(x)
        x = nn.relu(x)
        x = nn.Conv(32, (3, 3), strides=(2, 2))(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(emb_size)(x)


def model():
    return _TinyNet()


def loss(config, m):
    return SoftmaxBasedMetricLearning(
        model=m, emb_size=emb_size, num_classes=n_classes,
        margin_type="arc", s=16.0, m=0.3, use_focal=True,
    )


def optimizer(config):
    # plain SGD+momentum collapses this tiny from-scratch ArcFace toy into the
    # all-antipodal well; adam converges in a few dozen steps.
    return optax.adam(3e-3)


class _SynthIdentities:
    '''K identities, each a distinct color blob + noise.'''

    def __init__(self):
        rng = np.random.RandomState(seed)
        self.protos = rng.uniform(0, 1, (n_classes, 8, 8, 3)).astype(np.float32)
        self.items = []
        for c in range(n_classes):
            for _ in range(n_per_class):
                img = np.repeat(np.repeat(self.protos[c], 4, 0), 4, 1)
                img = img + rng.normal(0, 0.05, img.shape).astype(np.float32)
                self.items.append((img.astype(np.float32), c))
        self.uid_to_indices = {
            c: [i for i, (_, cc) in enumerate(self.items) if cc == c]
            for c in range(n_classes)
        }

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        img, label = self.items[i]
        return {"x": img, "label": label, "index": i}


_ds = _SynthIdentities()
_pairs = PairGenerator(_ds, gen_number=40, gen_ratio=1.0, random_seed=seed,
                       usr_list=list(range(n_classes)))


def train_dataloader():
    return DataLoader(_ds, batch_size=train_batch_size, shuffle=True, seed=seed,
                      num_workers=0)


def val_dataloader():
    return DataLoader(_ds, batch_size=test_batch_size, shuffle=False,
                      drop_last=False, num_workers=0)


def pair_generator(i):
    return "synth", _pairs
"""


@pytest.fixture
def fe_config(tmp_path):
    out = tmp_path / "run"
    out.mkdir()
    cfg_file = tmp_path / "tiny_fe.py"
    cfg_file.write_text(
        textwrap.dedent(CONFIG_TEMPLATE.replace("{output}", str(out)))
    )
    return get_dict_wrapper(cfg_file)


def test_fit_validate_checkpoint_resume(fe_config, tmp_path):
    mesh = create_mesh()
    assert mesh.devices.size == 8

    controller = Controller(fe_config, mesh=mesh)
    trainer = Trainer(config=fe_config, mesh=mesh,
                      default_root_dir=fe_config.output)
    state = trainer.fit(controller)

    # verification metrics look like a trained model
    results = trainer.validate(controller, state)
    m = results["synth"]
    assert m["ROC AUC"] > 0.95, m
    assert m["Recall@K=1"] > 0.9, m

    # training made progress: high train accuracy on this separable toy task.
    # NOTE: train_step donates its input state; use the returned one afterwards.
    train_step = controller.make_train_step()
    batch = next(iter(controller.train_dataloader()))
    import jax
    from pets_face_recognition_tpu.parallel import shard_batch
    db = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    state, metrics = train_step(state, db, jax.random.PRNGKey(0))
    assert float(metrics["train_acc"]) > 0.9, float(metrics["train_acc"])

    # checkpoints written with the reference naming scheme
    ckpt = latest_checkpoint(f"{fe_config.output}/checkpoints")
    assert ckpt is not None and ckpt.name.startswith("epoch=24-step=")

    # resume: a fresh trainer picks up from the checkpoint and continues
    trainer2 = Trainer(config=fe_config, mesh=mesh,
                       default_root_dir=fe_config.output, max_epochs=27)
    controller2 = Controller(fe_config, mesh=mesh)
    state2 = trainer2.fit(controller2)
    assert int(state2.step) > int(state.step)


def test_fast_dev_run(fe_config):
    mesh = create_mesh()
    controller = Controller(fe_config, mesh=mesh)
    trainer = Trainer(config=fe_config, mesh=mesh, fast_dev_run=True,
                      enable_checkpointing=False,
                      default_root_dir=fe_config.output)
    state = trainer.fit(controller)
    assert int(state.step) == 1


def test_overfit_clip_accumulate_knobs(fe_config):
    """PL-parity Trainer knobs: overfit_batches repeats fixed batches (no
    validation), gradient_clip_val + accumulate_grad_batches wrap the
    optimizer (MultiSteps applies the inner update every k-th call)."""
    import jax

    mesh = create_mesh()
    controller = Controller(fe_config, mesh=mesh)
    trainer = Trainer(config=fe_config, mesh=mesh, max_epochs=1,
                      enable_checkpointing=False,
                      overfit_batches=2, gradient_clip_val=1.0,
                      accumulate_grad_batches=2,
                      default_root_dir=fe_config.output)
    state = trainer.fit(controller)
    assert int(state.step) == 2  # 2 fixed batches, 1 epoch

    # with k=2 accumulation, params change only after the 2nd micro-batch
    controller2 = Controller(fe_config, mesh=mesh)
    controller2.accumulate_grad_batches = 2
    controller2.gradient_clip_val = 1.0
    batch = next(iter(controller2.train_dataloader()))
    from pets_face_recognition_tpu.parallel import shard_batch
    db = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    st = controller2.init_state(jax.random.PRNGKey(0), batch)
    p0 = jax.tree_util.tree_leaves(st.params)[0].copy()
    step = controller2.make_train_step()
    st, _ = step(st, db, jax.random.PRNGKey(1))
    p1 = jax.tree_util.tree_leaves(st.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    st, _ = step(st, db, jax.random.PRNGKey(2))
    p2 = jax.tree_util.tree_leaves(st.params)[0]
    assert np.abs(np.asarray(p2) - np.asarray(p0)).max() > 0
