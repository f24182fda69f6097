"""Batch-size and learning-rate tuners.

Counterparts of the PL tuner wrappers the reference exposes
(``/root/reference/utils/__init__.py:137-148``, invoked from ``main.py:79-89``):

- :func:`find_max_batch_size` — power-of-two scaling until the jitted train step
  OOMs on device (the TPU analog of PL's ``scale_batch_size``);
- :func:`find_optimal_init_lr` — the Smith LR-range test: sweep lr exponentially
  over a short run, pick the steepest-descent lr (PL's ``lr_find`` heuristic:
  min-loss lr / 10).
"""

from __future__ import annotations

import math

import jax
import numpy as np
import optax


def find_max_batch_size(
    controller,
    sample_batch: dict,
    start: int = 16,
    max_trials: int = 8,
) -> int:
    """Double the batch until the train step fails to fit; return the last good."""
    import jax.numpy as jnp

    def try_batch(bs: int) -> bool:
        batch = {
            k: np.repeat(np.asarray(v)[:1], bs, axis=0)
            for k, v in sample_batch.items()
        }
        try:
            state = controller.init_state(jax.random.PRNGKey(0), batch)
            step = controller.make_train_step()
            out_state, _ = step(state, {k: jnp.asarray(v)
                                        for k, v in batch.items()},
                                jax.random.PRNGKey(1))
            jax.block_until_ready(out_state.step)
            return True
        except Exception as e:  # XlaRuntimeError: RESOURCE_EXHAUSTED
            if "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e):
                return False
            raise

    bs = start
    best = 0
    for _ in range(max_trials):
        if not try_batch(bs):
            break
        best = bs
        bs *= 2
    return best


def find_optimal_init_lr(
    controller,
    loader,
    min_lr: float = 1e-6,
    max_lr: float = 1.0,
    num_steps: int = 100,
) -> float:
    """LR-range test: exponential lr sweep, return ``argmin(smoothed loss) / 10``."""
    import jax.numpy as jnp

    lrs = np.exp(np.linspace(math.log(min_lr), math.log(max_lr), num_steps))

    it = iter(loader)
    first = next(it)
    state = controller.init_state(jax.random.PRNGKey(0), first)

    # rebuild the optimizer with an injectable lr
    lr_schedule_state = {"lr": float(lrs[0])}
    base_tx = optax.inject_hyperparams(optax.sgd)(
        learning_rate=float(lrs[0]), momentum=0.9
    )
    state = state.replace(tx=base_tx, opt_state=base_tx.init(state.params))
    step_fn = controller.make_train_step()

    losses = []
    batch = first
    for i, lr in enumerate(lrs):
        state.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
        state, metrics = step_fn(
            state, {k: jnp.asarray(v) for k, v in batch.items()},
            jax.random.fold_in(jax.random.PRNGKey(1), i),
        )
        loss = float(metrics["loss"])
        if not math.isfinite(loss):
            break
        losses.append((lr, loss))
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)

    if not losses:
        return min_lr
    # smooth and take the steepest/min-loss point / 10 (PL lr_find heuristic)
    arr = np.array([l for _, l in losses])
    kernel = np.ones(5) / 5
    smooth = np.convolve(arr, kernel, mode="same")
    best_lr = losses[int(np.argmin(smooth))][0]
    return float(best_lr / 10.0)
