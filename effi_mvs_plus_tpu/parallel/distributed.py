"""Multi-host runtime: process initialisation, global meshes, host-local
data feeding, metric reduction, and scene partitioning.

TPU-native replacement for the reference's dormant torch.distributed/NCCL
stack (/root/reference/train.py:408-501, utils.py:163-202 — SURVEY §5.8):

* ``initialize()``            — jax.distributed rendezvous (env-var driven,
                                the moral equivalent of init_method='env://')
* ``global_mesh()``           — one mesh over all hosts' devices; the data
                                axis spans (DCN x ICI) so gradient psum
                                rides ICI within a slice and DCN across
* ``host_local_batch()``      — per-host shard -> global jax.Array (the
                                DistributedSampler + scatter analogue)
* ``mean_metrics()``          — cross-process scalar reduction (replaces
                                dist.reduce to rank 0; every host gets the
                                result)
* ``partition()``             — static round-robin of scans/ref-views over
                                hosts for inference + fusion (SURVEY §2.5
                                scene/task parallelism)
* ``is_main()``               — rank-0 guard for checkpoint/log writes
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialise the multi-process runtime.

    No-op (returns False) when neither arguments nor the standard env vars
    (JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS, NUM_PROCESSES /
    WORLD_SIZE, PROCESS_ID / RANK) describe a multi-process job — so
    single-host scripts can call it unconditionally.
    """
    addr = (coordinator_address
            or os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    nproc = num_processes if num_processes is not None else int(
        os.environ.get("NUM_PROCESSES", os.environ.get("WORLD_SIZE", "1")))
    pid = process_id if process_id is not None else int(
        os.environ.get("PROCESS_ID", os.environ.get("RANK", "0")))
    if nproc <= 1 and addr is None:
        return False
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=nproc, process_id=pid)
    return True


def is_main() -> bool:
    return jax.process_index() == 0


def global_mesh(model: int = 1, devices=None) -> Mesh:
    """(data, model) mesh over every device of every process.

    Device order follows ``jax.devices()`` (process-major), so contiguous
    blocks of the data axis are host-local: the all-reduce tree does ICI
    within a host's chips first and crosses DCN once — the layout the
    scaling-book recipe prescribes for pure data parallel + small models.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model == 0, f"{n} devices not divisible by model={model}"
    arr = np.asarray(devices).reshape(n // model, model)
    return Mesh(arr, ("data", "model"))


def host_local_batch(batch, mesh: Mesh):
    """Per-process local batch -> global array sharded along 'data'.

    Each process supplies its own slice of the global batch (global batch
    size = local x num_processes).  Single-process: plain device_put.
    """
    if jax.process_count() == 1:
        def put(x):
            spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.tree.map(put, batch)

    from jax.experimental import multihost_utils

    def put(x):
        x = np.asarray(x)
        spec = P("data") if x.ndim >= 1 else P()
        return multihost_utils.host_local_array_to_global_array(
            x, mesh, spec)
    return jax.tree.map(put, batch)


def mean_metrics(metrics: dict) -> dict:
    """Mean of scalar metrics across processes (reference
    utils.py:184-202 `reduce_scalar_outputs`, but symmetric)."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    from jax.experimental import multihost_utils
    keys = sorted(metrics)
    local = np.asarray([float(metrics[k]) for k in keys], np.float32)
    summed = multihost_utils.process_allgather(local).sum(axis=0)
    return {k: float(summed[i] / jax.process_count())
            for i, k in enumerate(keys)}


def partition(items: Sequence, n_parts: Optional[int] = None,
              part: Optional[int] = None):
    """Static round-robin split of work items (scans, ref views) across
    processes; with no arguments uses the live process grid."""
    n = n_parts if n_parts is not None else jax.process_count()
    p = part if part is not None else jax.process_index()
    return [x for i, x in enumerate(items) if i % n == p]


def barrier(name: str = "barrier"):
    """Cross-process sync point (reference utils.py:163-175)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
