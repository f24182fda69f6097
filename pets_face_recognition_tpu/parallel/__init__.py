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

__all__ = [
    "MeshSpec",
    "batch_sharding",
    "create_mesh",
    "replicated",
    "shard_batch",
    "local_mesh",
    "init_distributed",
    "device_info",
]
