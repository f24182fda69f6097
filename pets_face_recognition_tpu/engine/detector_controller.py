"""Detection task controller (Mask R-CNN body detector).

Functional counterpart of the reference ``DetectionController``
(``/root/reference/engine/detector_controller.py``): the class-label +1 shift
(background = 0, ``:22-27``), eval-mode forward returning detections, and the
greedy-matching AP / IoU / mask-IoU evaluation (``:124-203``) re-expressed over
padded fixed-size batches.

Batch contract (from ``utils/collate.detection_collate``):
``{'images' (B, H, W, 3), 'boxes' (B, G, 4), 'labels' (B, G), 'valid' (B, G),
['masks' (B, G, H, W)], ['keypoints' (B, G, K, 3)]}``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.masks import paste_masks
from .detection_metrics import detection_metrics, unpad_detections, unpad_targets
from .train_state import TrainState


class DetectionController:
    """Mask/Faster R-CNN task."""

    eval_thresholds = (0.5, 0.7, 0.9)
    with_masks = True
    with_keypoints = False

    def __init__(self, config, mesh: Mesh | None = None):
        self.config = config
        self.mesh = mesh
        model = config.model()
        self.model_loss = config.loss(config, model)

    # -- state --------------------------------------------------------------
    def _targets_from_batch(self, batch: dict) -> dict:
        targets = {
            # +1: background is class 0 (detector_controller.py:22-27)
            "labels": jnp.asarray(batch["labels"]) + 1,
            "boxes": jnp.asarray(batch["boxes"], jnp.float32),
            "valid": jnp.asarray(batch["valid"], bool),
        }
        if "masks" in batch:
            targets["masks"] = jnp.asarray(batch["masks"], jnp.float32)
        if "keypoints" in batch:
            targets["keypoints"] = jnp.asarray(batch["keypoints"], jnp.float32)
        return targets

    def init_state(self, rng: jax.Array, sample_batch: dict) -> TrainState:
        images = jnp.asarray(sample_batch["images"][:1])
        targets = jax.tree_util.tree_map(
            lambda x: x[:1], self._targets_from_batch(sample_batch)
        )
        params_rng, sampler_rng = jax.random.split(rng)
        variables = self.model_loss.init(
            {"params": params_rng, "sampler": sampler_rng},
            images, targets, train=True,
        )
        tx = self.config.optimizer(self.config)
        from ..utils.optim import wrap_gradient_transform

        tx = wrap_gradient_transform(
            tx, getattr(self, "gradient_clip_val", None),
            getattr(self, "accumulate_grad_batches", 1))
        state = TrainState.create(self.model_loss.apply, variables, tx)
        if self.mesh is not None:
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
        return state

    # -- steps --------------------------------------------------------------
    def make_train_step(self):
        def train_step(state: TrainState, batch: dict, rng: jax.Array):
            targets = self._targets_from_batch(batch)

            # batch_stats is declared mutable so live-BN backbones (e.g. the
            # MobileNetV3 smoke recipe training from scratch — no pretrained
            # frozen stats exist offline) update running stats; the
            # production frozen-stats trunks (torchvision FrozenBatchNorm2d
            # parity, ref models/detection/rcnn.py:111) never write, so
            # `mutated` comes back empty and the state is unchanged.
            def loss_fn(params):
                out, mutated = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["images"], targets, train=True,
                    rngs={"sampler": rng}, mutable=["batch_stats"],
                )
                return out["loss"], (out, mutated)

            (loss, (out, mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_state = state.apply_gradients(
                grads, mutated.get("batch_stats", state.batch_stats))
            metrics = {k: v for k, v in out.items()}
            return new_state, metrics

        # data sharding comes from input placement (shard_batch); params are
        # replicated by init_state's device_put — jit propagates both.
        return jax.jit(train_step, donate_argnums=(0,))

    def make_eval_step(self):
        paste = self.with_masks

        def eval_step(state: TrainState, images):
            dets = state.apply_fn(state.variables, images, train=False)
            if paste and "masks" in dets:
                B, D = dets["masks"].shape[:2]
                H, W = images.shape[1:3]
                dets["masks"] = jax.vmap(
                    lambda m, b: paste_masks(m, b, (H, W))
                )(dets["masks"], dets["boxes"])
            return dets

        return jax.jit(eval_step)

    def run_eval_batch(self, eval_step, state, batch, mesh):
        """One eval batch → ``{'pred', 'true', 'batch_size'}`` on host.

        Targets get the same +1 label shift as training
        (``keypoints_controller.py:31-34``)."""
        from ..parallel import shard_batch

        images = np.asarray(batch["images"])
        B = images.shape[0]
        if mesh is not None:
            images = shard_batch({"images": images}, mesh)["images"]
        dets = eval_step(state, images)
        true = {
            "boxes": np.asarray(batch["boxes"]),
            "labels": np.asarray(batch["labels"]) + 1,
            "valid": np.asarray(batch["valid"]),
        }
        if "masks" in batch:
            true["masks"] = np.asarray(batch["masks"])
        if "keypoints" in batch:
            true["keypoints"] = np.asarray(batch["keypoints"])
        return {"pred": jax.device_get(dets), "true": true, "batch_size": B}

    # -- evaluation ----------------------------------------------------------
    def evaluate(self, outputs: list[list[dict]], logger=None, epoch: int = 0,
                 prefix: str = "") -> dict[str, dict[str, float]]:
        """``outputs[i]`` = list of ``{'pred': dets_dict, 'true': targets_dict,
        'batch_size': int}`` per eval dataloader."""
        names = ("train", "val") if len(outputs) > 1 else ("val",)
        all_metrics = {}
        for name, batches in zip(names, outputs):
            preds, trues = [], []
            for b in batches:
                preds.extend(unpad_detections(b["pred"], b["batch_size"]))
                trues.extend(unpad_targets(b["true"], b["batch_size"]))
            metrics = detection_metrics(
                preds, trues,
                thresholds=self.eval_thresholds,
                with_masks=self.with_masks,
                with_keypoints=self.with_keypoints,
            )
            all_metrics[name] = metrics
            if logger is not None:
                logger.log_metrics(
                    {f"{prefix}{name} {k}": v for k, v in metrics.items()}, epoch
                )
            else:
                print(*[f"{name} {k}\t{v}" for k, v in metrics.items()], sep="\n")
        return all_metrics

    # -- dataloaders ----------------------------------------------------------
    def train_dataloader(self):
        return self.config.train_dataloader()

    def val_dataloader(self):
        return self.config.val_dataloader()

    def test_dataloader(self):
        dl = self.config.get("test_dataloader")
        return dl() if dl is not None else self.config.val_dataloader()


class KeyPointsController(DetectionController):
    """Keypoint R-CNN task: same machinery + NME landmark metrics
    (``/root/reference/engine/keypoints_controller.py``)."""

    eval_thresholds = (0.5, 0.7)
    with_masks = False
    with_keypoints = True
