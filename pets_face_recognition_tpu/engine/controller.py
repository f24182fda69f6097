"""Feature-extractor task controller.

Functional counterpart of the reference ``Controller`` LightningModule
(``/root/reference/engine/controller.py:14-246``): owns the model+loss assembly from
the config, exposes pure jitted ``train_step`` / ``eval_step`` functions, and the
verification-metric evaluation over pair lists.

Config contract (parity with ``configs/cat_fe/cat_fe_head.py:95-162``):
- ``model()``                     → flax module producing embeddings;
- ``loss(config, model)``         → wrapper module (``SoftmaxBasedMetricLearning``);
- ``optimizer(config)``           → ``optax.GradientTransformation``;
- ``train_dataloader()`` / ``val_dataloader()`` [/ ``test_dataloader()``] →
  iterables of ``{'x', 'label', 'index'}`` numpy batches;
- ``pair_generator(i)``           → ``(name, PairGenerator)`` per val dataloader;
- ``thrs`` / ``far_thr`` / ``k``  → metric knobs;
- ``seed``, ``n_epochs``, ``output``.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .metrics import cosine_pair_scores, recall_at_k, verification_metrics
from .train_state import TrainState


class Controller:
    """FE task: embeddings + large-margin classification loss."""

    def __init__(self, config, mesh: Mesh | None = None):
        self.config = config
        self.mesh = mesh
        model = config.model()
        self.model_loss = config.loss(config, model)

    # -- state ------------------------------------------------------------
    def init_state(self, rng: jax.Array, sample_batch: dict) -> TrainState:
        x = jnp.asarray(sample_batch["x"][:1])
        labels = jnp.asarray(sample_batch["label"][:1])
        variables = self.model_loss.init(rng, x, labels, train=False)
        tx = self.config.optimizer(self.config)
        from ..utils.optim import wrap_gradient_transform

        tx = wrap_gradient_transform(
            tx, getattr(self, "gradient_clip_val", None),
            getattr(self, "accumulate_grad_batches", 1))
        state = TrainState.create(self.model_loss.apply, variables, tx)
        if self.mesh is not None:
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
        return state

    # -- steps ------------------------------------------------------------
    def make_train_step(self):
        """Jitted, data-sharded training step: grads all-reduce implicitly."""

        def train_step(state: TrainState, batch: dict, rng: jax.Array):
            def loss_fn(params):
                out, mutated = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["x"],
                    batch["label"],
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": rng},
                )
                return out["loss"], (out, mutated)

            (loss, (out, mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            new_state = state.apply_gradients(
                grads, mutated.get("batch_stats", state.batch_stats)
            )
            acc = jnp.mean(
                (jnp.argmax(out["logits"], axis=-1) == batch["label"]).astype(
                    jnp.float32
                )
            )
            return new_state, {"loss": loss, "train_acc": acc}

        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))
            return jax.jit(
                train_step,
                in_shardings=(repl, {"x": data, "label": data, "index": data}, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )
        return jax.jit(train_step, donate_argnums=(0,))

    def make_eval_step(self):
        def eval_step(state: TrainState, x):
            return state.apply_fn(state.variables, x, train=False)

        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))
            return jax.jit(eval_step, in_shardings=(repl, data), out_shardings=repl)
        return jax.jit(eval_step)

    def run_eval_batch(self, eval_step, state, batch, mesh):
        """One eval-loader batch → host outputs for :meth:`evaluate`."""
        from ..parallel import shard_batch

        x = np.asarray(batch["x"])
        if mesh is not None:
            x = shard_batch({"x": x}, mesh)["x"]
        emb = eval_step(state, x)
        return {
            "emb": jax.device_get(emb),
            "label": np.asarray(batch["label"]),
            "index": np.asarray(batch["index"]),
        }

    # -- evaluation (reference _evaluate, controller.py:95-203) ------------
    def evaluate(self, outputs: list[list[dict]], logger=None, epoch: int = 0,
                 prefix: str = "") -> dict[str, dict[str, float]]:
        """``outputs[i]`` = list of per-batch dicts for val dataloader ``i``.

        Returns ``{name: metrics}`` and optionally logs them. When the config
        carries an ``img_dir``, a confusion-matrix PNG (at the optimal
        threshold) and a combined ROC-curve PNG are written per epoch —
        the reference's matplotlib artifacts (``controller.py:184-203``).
        """
        all_metrics = {}
        rocs = []
        for i, batches in enumerate(outputs):
            emb = np.concatenate([np.asarray(b["emb"]) for b in batches], axis=0)
            classes = np.concatenate([np.asarray(b["label"]) for b in batches])
            indices = np.concatenate([np.asarray(b["index"]) for b in batches])
            order = np.argsort(indices)
            emb, classes = emb[order], classes[order]

            name, pair_generator = self.config.pair_generator(i)
            pairs = np.asarray(pair_generator.corrected_indices)
            labels = np.asarray(pair_generator.labels)

            similarity_f = self.config.get("similarity_f") or cosine_pair_scores
            scores = np.asarray(similarity_f(jnp.asarray(emb), pairs))

            metrics = verification_metrics(
                scores,
                labels,
                thrs=tuple(self.config.get("thrs", ())),
                far_thrs=tuple(self.config.get("far_thr", ())),
                frr_thrs=tuple(self.config.get("frr_thr", ())),
            )
            metrics.update(
                recall_at_k(jnp.asarray(emb), jnp.asarray(classes),
                            tuple(self.config.get("k", ())))
            )
            all_metrics[name] = metrics
            rocs.append((name, scores, labels, metrics))
            if logger is not None:
                logger.log_metrics(
                    {f"{prefix}{name} {k}": v for k, v in metrics.items()}, epoch
                )
            else:
                print(*[f"{name} {k}\t{v}" for k, v in metrics.items()], sep="\n")

        img_dir = self.config.get("img_dir")
        if img_dir is not None:
            _save_eval_plots(rocs, img_dir, epoch)
        return all_metrics

    # -- dataloaders (delegated to config, controller.py:230-243) ----------
    def train_dataloader(self):
        return self.config.train_dataloader()

    def val_dataloader(self):
        return self.config.val_dataloader()

    def test_dataloader(self):
        dl = self.config.get("test_dataloader")
        return dl() if dl is not None else self.config.val_dataloader()


def _save_eval_plots(rocs, img_dir, epoch: int) -> None:
    """Confusion-matrix + ROC artifacts (reference ``controller.py:184-203``)."""
    from pathlib import Path

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.metrics import roc_curve

    img_dir = Path(img_dir)
    img_dir.mkdir(parents=True, exist_ok=True)

    plt.figure(figsize=(10, 10))
    for name, scores, labels, metrics in rocs:
        opt_thr = metrics.get("Opt thr", 0.5)
        pred = scores > opt_thr
        tp = int((pred & (labels == 1)).sum())
        fp = int((pred & (labels == 0)).sum())
        fn = int((~pred & (labels == 1)).sum())
        tn = int((~pred & (labels == 0)).sum())
        fig, ax = plt.subplots()
        ax.imshow([[tn, fp], [fn, tp]], cmap="Blues")
        for (r, c), v in zip([(0, 0), (0, 1), (1, 0), (1, 1)],
                             [tn, fp, fn, tp]):
            ax.text(c, r, str(v), ha="center", va="center")
        ax.set_xlabel("predicted")
        ax.set_ylabel("true")
        fig.savefig(img_dir / f" {name}_confmat_{epoch}.png")
        plt.close(fig)

    plt.figure(figsize=(10, 10))
    for name, scores, labels, metrics in rocs:
        fpr, tpr, _ = roc_curve(labels, scores)
        plt.plot(fpr, tpr, label=f"{name} AUC = {metrics['ROC AUC']}",
                 linewidth=3)
    plt.plot([0, 1], [0, 1], "k--", linewidth=3)
    plt.xlabel("False positive rate")
    plt.ylabel("True positive rate")
    plt.title("ROC curves")
    plt.grid()
    plt.legend()
    plt.savefig(img_dir / f"roc_{epoch}.png")
    plt.close("all")
