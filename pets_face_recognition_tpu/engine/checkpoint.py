"""Checkpoint store (orbax-backed).

Replaces the reference's PyTorch-Lightning ModelCheckpoint + CheckpointConnector
(``/root/reference/engine/trainer.py:111,175-177,614-620``; SURVEY.md §5). Keeps the
reference's on-disk naming convention ``epoch=N-step=M`` under a ``checkpoints/`` dir
(``main.py:46``) so eval scripts and preprocessor pipelines can locate weights the
same way.

Stored payload: ``{'params', 'batch_stats', 'opt_state', 'step', 'epoch'}``. Loading
supports param-only restoration for inference (the reference ships FE checkpoints with
the ``add_margin`` head stripped and loads ``strict=False`` —
``eval_fe_cat_head_sgd.py:21``; here ``load_params`` simply ignores missing subtrees).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str | Path, state, epoch: int) -> Path:
    """Save ``state`` as ``<ckpt_dir>/epoch=E-step=S``; returns the path."""
    step = int(state.step)
    path = Path(ckpt_dir).resolve() / f"epoch={epoch}-step={step}"
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": step,
        "epoch": epoch,
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def load_checkpoint(path: str | Path) -> dict[str, Any]:
    """Load a raw checkpoint payload dict (numpy leaves)."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).resolve())


def load_params(path: str | Path) -> tuple[Any, Any]:
    """Load just ``(params, batch_stats)`` for inference."""
    payload = load_checkpoint(path)
    return payload["params"], payload.get("batch_stats", {})


def latest_checkpoint(ckpt_dir: str | Path) -> Path | None:
    """Highest-step ``epoch=*-step=*`` entry under ``ckpt_dir`` (resume support)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    best, best_step = None, -1
    for p in ckpt_dir.iterdir():
        m = re.fullmatch(r"epoch=(\d+)-step=(\d+)", p.name)
        if m and int(m.group(2)) > best_step:
            best, best_step = p, int(m.group(2))
    return best


def merge_params(target: Any, loaded: Any) -> Any:
    """Non-strict merge: overwrite leaves of ``target`` present in ``loaded``.

    Mirrors ``load_state_dict(strict=False)`` semantics used for the shipped FE
    checkpoints with the margin head removed (``download_models.py:8-9``).
    """
    if isinstance(target, dict):
        out = {}
        for k, v in target.items():
            if isinstance(loaded, dict) and k in loaded:
                out[k] = merge_params(v, loaded[k])
            else:
                out[k] = v
        return out
    if loaded is None:
        return target
    loaded_arr = np.asarray(loaded)
    if loaded_arr.shape != np.asarray(target).shape:
        raise ValueError(
            f"checkpoint shape mismatch: {loaded_arr.shape} vs {np.shape(target)}"
        )
    return loaded_arr
