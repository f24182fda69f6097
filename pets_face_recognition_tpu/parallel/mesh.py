"""Mesh + sharding utilities.

TPU-native replacement for the reference's DDP wiring
(``/root/reference/utils/__init__.py:114-119``, ``engine/trainer.py:646-652``): instead
of per-process NCCL replicas, one SPMD program runs over a ``jax.sharding.Mesh``.
Gradient all-reduce is implicit in jit-ing a data-sharded loss; the mid-epoch
validation barrier of the reference (``engine/loops/train_loop.py:16-17``) vanishes —
SPMD has no rank-0 asymmetry.

Axes convention used across the framework:
- ``data``    — batch dimension (DP). Always present.
- ``model``   — reserved for tensor-parallel sharding of wide layers (margin-head
                class dimension, retrieval gallery dimension).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh description used in configs (replaces the reference's
    ``device``/``distributed_train``/``world_size`` block,
    ``configs/cat_fe/cat_fe_head.py:159-162``)."""

    shape: tuple[int, ...] = (-1,)
    axes: tuple[str, ...] = ("data",)

    def build(self, devices: Sequence[jax.Device] | None = None) -> Mesh:
        devices = list(devices if devices is not None else jax.devices())
        shape = list(self.shape)
        if -1 in shape:
            known = int(np.prod([s for s in shape if s != -1])) if len(shape) > 1 else 1
            shape[shape.index(-1)] = len(devices) // max(known, 1)
        n = int(np.prod(shape))
        mesh_devices = np.asarray(devices[:n]).reshape(shape)
        return Mesh(mesh_devices, self.axes)


def create_mesh(
    shape: Sequence[int] = (-1,),
    axes: Sequence[str] = ("data",),
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a mesh over the available devices; ``-1`` infers the axis size."""
    return MeshSpec(tuple(shape), tuple(axes)).build(devices)


def local_mesh() -> Mesh:
    """A 1-axis ``data`` mesh over every visible device (single-host default)."""
    return create_mesh()


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits dim 0 (batch) over `axis`, replicating the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a pytree of host arrays with dim 0 sharded over ``axis``.

    Pads nothing: callers must make the batch divisible by the axis size (the data
    loader guarantees this by dropping remainders, mirroring the reference's
    ``drop_last`` dataloaders).
    """
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
