"""Device mesh construction and sharding helpers (SPMD over ICI).

The reference's only parallelism is DDP (``/root/reference/utils/__init__.py:114-119``);
here data parallelism is a mesh axis, and retrieval adds a gallery-sharded axis
(SURVEY.md §2.11).
"""

from .mesh import (
    MeshSpec,
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
    local_mesh,
)
from .distributed import device_info, init_distributed


def shard_map_compat(f, *, mesh, in_specs, out_specs):
    """``jax.shard_map`` with fallback to the pre-0.8 experimental location."""
    import jax

    if hasattr(jax, "shard_map"):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs)
    from jax.experimental.shard_map import shard_map

    return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


__all__ = [
    "MeshSpec",
    "batch_sharding",
    "create_mesh",
    "replicated",
    "shard_batch",
    "local_mesh",
    "init_distributed",
    "device_info",
    "shard_map_compat",
]
