"""Multi-host SPMD initialization.

Replaces the reference's DDP world wiring (``/root/reference/utils/__init__.py:
75-119``: CUDA device probing + ``DDPPlugin`` + env-rank gating) with the JAX
runtime model: one call to ``jax.distributed.initialize`` per host, then a single
global mesh over all devices. Gradient all-reduce is implicit in the data-sharded
jit; there are no per-rank code paths.
"""

from __future__ import annotations

import os

import jax


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX. No-op for single-process runs.

    Args default from the standard env vars (``COORDINATOR_ADDRESS``,
    ``NUM_PROCESSES``, ``PROCESS_ID``) so launchers can stay generic; on Cloud
    TPU pods ``jax.distributed.initialize()`` auto-detects everything.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("PROCESS_ID")
    if coordinator_address is None and num_processes is None:
        # single process (or TPU pod auto-detection handles it)
        try:
            if jax.process_count() > 1:
                return  # already initialized by the runtime
        except RuntimeError:
            pass
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def _int_env(name: str) -> int | None:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def device_info() -> dict:
    """Device inventory — the JAX-native ``get_gpus``/``parse_gpus``
    (ref ``utils/__init__.py:75-107`` probes CUDA devices by trial allocation;
    here the runtime just reports them)."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": [str(d) for d in jax.local_devices()],
        "global_device_count": jax.device_count(),
        "platform": jax.default_backend(),
    }
