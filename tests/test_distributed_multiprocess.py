"""Multi-process distributed smoke: real ``jax.distributed.initialize``.

Backs the multi-host DP claim (SURVEY §5 "distributed communication backend",
§2.11): the reference wires a DDP world via env ranks + NCCL
(``/root/reference/utils/__init__.py:75-119``); here ``init_distributed``
(``parallel/distributed.py``) brings up the JAX coordination service and the
collectives ride the runtime. The in-process 8-device CPU mesh used everywhere
else in the suite never exercises that bootstrap path — this test launches TWO
real OS processes, each owning one CPU device, and checks:

- ``jax.distributed.initialize`` handshakes through ``init_distributed``'s
  env-var plumbing (``COORDINATOR_ADDRESS``/``NUM_PROCESSES``/``PROCESS_ID``);
- ``device_info()`` sees a 2-device global world from both processes;
- ``is_main_process`` is True exactly on process 0;
- a cross-process all-reduce (``psum`` over a global mesh) produces the sum of
  both processes' shards — the primitive under data-parallel gradient sync.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

_WORKER = r"""
import json, os, sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.environ["PFR_REPO"])
from pets_face_recognition_tpu.parallel.distributed import (
    device_info,
    init_distributed,
)
from pets_face_recognition_tpu.utils import is_main_process

init_distributed()  # everything via COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

info = device_info()
assert info["process_count"] == 2, info
assert info["global_device_count"] == 2, info

mesh = Mesh(np.asarray(jax.devices()).reshape(2), ("data",))
sharding = NamedSharding(mesh, P("data"))

# per-process shard: process i contributes a row of (i + 1)s; the all-reduce
# under a data-sharded jit must see both processes' rows
pid = info["process_index"]
local = jnp.full((1, 8), float(pid + 1), jnp.float32)
global_x = jax.make_array_from_single_device_arrays(
    (2, 8), sharding, [jax.device_put(local, jax.local_devices()[0])]
)

@jax.jit
def global_sum(x):
    return jnp.sum(x)  # jit inserts the cross-process all-reduce

total = float(global_sum(global_x))

print(json.dumps({
    "process_index": pid,
    "is_main": bool(is_main_process()),
    "total": total,
    "process_count": info["process_count"],
    "global_device_count": info["global_device_count"],
}))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_initialize_and_allreduce(tmp_path):
    port = _free_port()
    repo = str(Path(__file__).resolve().parents[1])
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            PFR_REPO=repo,
            COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            # one device per process: the point is the cross-PROCESS path
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )

    results = {}
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\nstdout={out}\nstderr={err}"
        rec = json.loads(out.strip().splitlines()[-1])
        results[rec["process_index"]] = rec

    assert set(results) == {0, 1}
    for pid, rec in results.items():
        assert rec["process_count"] == 2
        assert rec["global_device_count"] == 2
        assert rec["is_main"] == (pid == 0)
        # rows of 1s and 2s, 8 wide: sum = 8*1 + 8*2 = 24 — requires BOTH shards
        assert rec["total"] == 24.0, rec
