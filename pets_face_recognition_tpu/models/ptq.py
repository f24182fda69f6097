"""Calibrate→int8 PTQ serving workflow over checkpointed weights.

``models/quant.py`` gives every serving backbone calibrate/int8 module twins
whose *parameter* trees match the float modules (torchvision converters and
orbax checkpoints are unaffected); what was missing until round 4 was the
deployment workflow around trained weights:

1. build the **calibrate** twin, adopt the checkpoint's params/batch_stats,
   and run the real float-precision forward over representative inputs while
   the ``quant`` variable collection records running max-abs activation
   ranges and snapshots the int8 kernels (``PTQServing.calibrate``);
2. persist the calibrated ``quant`` collection (``save_quant_state``);
3. serve the **int8** twin over the identical params + the calibrated
   ``quant`` state (``PTQServing.serve_fn``).

The calibrate forward is mathematically the float forward (QuantConv
calibrate mode runs the convolution in the compute dtype and only *observes*
activations), so a calibration pass over a corpus doubles as the float
baseline for rank-safety differentials: ``tools/rank_safety_drive.sh`` runs
the full detect→align→embed→score→tsv chain once in ``calibrate`` mode and
once in ``int8`` mode and diffs the tsv rank lists (BASELINE.md's
"rank-identical tsv" contract; ref ``generate_tsv_to_reproduce1.py:111-141``).

Env knobs consumed by ``configs/retrieval_common.py`` / ``configs/pipelines.py``:

- ``PFR_QUANT_MODE``: "" (float, default) | "calibrate" | "int8";
- ``PFR_QUANT_STATE``: path of the pickled quant-state file
  (default ``quant_state.pkl``) — written on process exit in calibrate mode,
  read eagerly in int8 mode;
- ``PFR_QUANT_COMPONENTS``: comma subset of ``embedder,detector,kp_head``
  (default all three) — which pipeline stages get the int8 treatment
  (``embedder`` = the 4 FE trunks; ``detector`` = R-CNN trunk+RPN at the
  shipping ``scope=rpn``; ``kp_head`` = the keypoint head conv chain).
"""

from __future__ import annotations

import atexit
import os
import pickle
from pathlib import Path
from typing import Callable

import jax
import numpy as np

QUANT_MODE_ENV = "PFR_QUANT_MODE"
QUANT_STATE_ENV = "PFR_QUANT_STATE"
QUANT_COMPONENTS_ENV = "PFR_QUANT_COMPONENTS"
_DEFAULT_STATE = "quant_state.pkl"
_DEFAULT_COMPONENTS = "embedder,detector,kp_head"


def quant_mode() -> str:
    mode = os.environ.get(QUANT_MODE_ENV, "")
    if mode not in ("", "calibrate", "int8"):
        raise ValueError(f"{QUANT_MODE_ENV}={mode!r}: expected '', 'calibrate'"
                         " or 'int8'")
    return mode


def quant_components() -> set[str]:
    comps = {c.strip() for c in os.environ.get(
        QUANT_COMPONENTS_ENV, _DEFAULT_COMPONENTS).split(",") if c.strip()}
    unknown = comps - {"embedder", "detector", "kp_head"}
    if unknown:
        raise ValueError(f"{QUANT_COMPONENTS_ENV}: unknown {sorted(unknown)}")
    return comps


def _state_path() -> Path:
    return Path(os.environ.get(QUANT_STATE_ENV, _DEFAULT_STATE))


class PTQServing:
    """One model's calibrate/int8 twin pair over fixed (checkpoint) weights.

    ``build_fn(mode)`` must return the flax module for ``mode`` in
    {"calibrate", "int8"} — twins over the SAME parameter tree
    (``models/quant.py`` contract). ``params``/``batch_stats`` come from the
    checkpoint; the ``quant`` collection starts from the calibrate twin's
    ``init`` on ``example`` (whose activation observation is immediately
    superseded by real calibration batches — ActQuant keeps a running max).
    """

    def __init__(self, name: str, build_fn: Callable, params, batch_stats,
                 example, apply_kwargs: dict | None = None):
        import jax.numpy as jnp

        self.name = name
        self.apply_kwargs = dict(apply_kwargs or {"train": False})
        self._calib = build_fn("calibrate")
        self._int8 = build_fn("int8")
        variables = jax.jit(
            lambda x: self._calib.init(jax.random.PRNGKey(0), x,
                                       **self.apply_kwargs)
        )(jnp.asarray(example))
        if "quant" not in variables:
            raise ValueError(
                f"{name}: build_fn('calibrate') declared no quant collection")
        self.quant = variables["quant"]
        self.params = params
        self.batch_stats = batch_stats
        self._calib_step = None
        self._serve = None

    # -- calibrate ----------------------------------------------------------
    def calibrate(self, x):
        """Float-precision forward that records activation ranges.

        Returns the model output (identical to the float path's) and folds
        the observed ranges into ``self.quant`` (running max across calls).
        """
        if self._calib_step is None:
            calib, kw = self._calib, self.apply_kwargs
            base = {"params": self.params, "batch_stats": self.batch_stats}

            @jax.jit
            def step(quant, x):
                out, mut = calib.apply({**base, "quant": quant}, x, **kw,
                                       mutable=["quant"])
                return out, mut["quant"]

            self._calib_step = step
        out, self.quant = self._calib_step(self.quant, x)
        return out

    # -- serve ---------------------------------------------------------------
    def serve_fn(self):
        """Jitted int8 forward over the calibrated quant state."""
        if self._serve is None:
            variables = {"params": self.params,
                         "batch_stats": self.batch_stats,
                         "quant": self.quant}
            int8, kw = self._int8, self.apply_kwargs
            self._serve = jax.jit(lambda x: int8.apply(variables, x, **kw))
        return self._serve

    def quant_numpy(self):
        return jax.tree_util.tree_map(np.asarray, jax.device_get(self.quant))

    def load_quant(self, tree):
        import jax.numpy as jnp

        ref_leaves = jax.tree_util.tree_structure(self.quant)
        got = jax.tree_util.tree_structure(tree)
        if ref_leaves != got:
            raise ValueError(
                f"{self.name}: quant-state tree mismatch — the saved state "
                f"was calibrated under a different model configuration "
                f"(e.g. a different {QUANT_COMPONENTS_ENV}). Re-run "
                f"calibrate mode with the SAME component subset and state "
                f"path as this int8 run.")
        self.quant = jax.tree_util.tree_map(jnp.asarray, tree)
        self._serve = None


# -- registry: every PTQServing built under calibrate mode saves on exit ----
_REGISTRY: dict[str, PTQServing] = {}
_atexit_installed = False


def register(runner: PTQServing) -> PTQServing:
    global _atexit_installed
    _REGISTRY[runner.name] = runner
    if quant_mode() == "calibrate" and not _atexit_installed:
        atexit.register(save_quant_state)
        _atexit_installed = True
    return runner


def save_quant_state(path: Path | None = None) -> Path:
    path = Path(path) if path is not None else _state_path()
    state = {name: r.quant_numpy() for name, r in _REGISTRY.items()}
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(state, f)
    # print WHICH submodules were calibrated per model: a quant state whose
    # detector entry holds only keypoint_head leaves means the trunk/RPN
    # quant never engaged (e.g. a lingering PFR_QUANT_COMPONENTS export) —
    # exactly the silent mislabeling that bit the round-4 quality run
    for name in sorted(state):
        tops = sorted(state[name]) if isinstance(state[name], dict) else []
        print(f"PTQ: {name}: calibrated submodules {tops}")
    print(f"PTQ: saved quant state for {sorted(state)} -> {path}")
    return path


def load_quant_state(name: str, path: Path | None = None):
    path = Path(path) if path is not None else _state_path()
    if not path.exists():
        raise FileNotFoundError(
            f"PFR_QUANT_MODE=int8 requires a calibrated quant state at "
            f"{path} — run the same command with PFR_QUANT_MODE=calibrate "
            f"first (see models/ptq.py)")
    with open(path, "rb") as f:
        state = pickle.load(f)
    if name not in state:
        raise KeyError(f"{path} has no quant state for {name!r} "
                       f"(has {sorted(state)})")
    return state[name]


class PTQModelFn:
    """``model_fn(images)`` facade dispatching on the process quant mode.

    - mode "calibrate": every call runs the float forward AND calibrates;
    - mode "int8": loads the saved quant state once, serves int8.
    """

    def __init__(self, runner: PTQServing, mode: str):
        self.runner = register(runner)
        self.mode = mode
        if mode == "int8":
            runner.load_quant(load_quant_state(runner.name))

    def __call__(self, x):
        if self.mode == "calibrate":
            return self.runner.calibrate(x)
        return self.runner.serve_fn()(x)
