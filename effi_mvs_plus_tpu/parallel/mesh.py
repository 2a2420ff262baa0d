"""Device-mesh parallelism: data parallel + cost-volume model parallel.

TPU-native replacement for the reference's NCCL stack (DataParallel /
dormant DDP, train.py:408-501, SURVEY §2.5): one global
``jax.sharding.Mesh`` whose axes are

* ``data``  — batch sharding; gradient psum is inserted by XLA because the
  loss averages over the sharded batch axis (the DDP all-reduce analogue,
  riding ICI).
* ``model`` — cost-volume sharding: the stage-1 plane sweep's depth-
  hypothesis axis (D=48) is annotated to split over this axis.  The
  per-view weighted correlation accumulation is associative
  (Effi_MVS_plus.py:48-71), so XLA partitions warp+correlate+regularise
  per depth chunk and inserts the halo exchanges for the 3-D U-Net —
  the MVS analogue of sequence/tensor parallelism (SURVEY §5.7).

The model code calls the ``constrain_*`` hooks, which are no-ops unless a
``ShardingPolicy`` is active — single-chip code paths pay nothing.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = None, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def fit_data_mesh(batch_size: int, devices=None) -> Mesh:
    """Largest data-parallel mesh whose 'data' axis divides batch_size
    (inference/eval batches can be smaller than the device count)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n > 1 and batch_size % n:
        n -= 1
    return make_mesh(data=n, model=1, devices=devices[:n])


def shard_batch(batch, mesh: Mesh):
    """device_put a host batch with the leading axis split over 'data'."""
    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


class ShardingPolicy:
    """Holds the mesh and the PartitionSpecs the model hooks apply."""

    def __init__(self, mesh: Mesh, shard_depth: bool = True,
                 shard_spatial: bool = False, shard_views: bool = False):
        self.mesh = mesh
        model = mesh.shape.get("model", 1) > 1
        self.shard_depth = shard_depth and model
        self.shard_spatial = shard_spatial and model
        # view-axis sharding (SURVEY §5.7): the FPN runs per view
        # independently — its activation stack (V, H, W, C) at full
        # resolution is the LARGEST temporary of the whole forward at the
        # T&T deployment point (buffer-assignment audit: ~3.3 GB of the
        # 3.8 GB fp32 total) — and the per-view weighted correlation
        # accumulation is associative, so sharding V over 'model' turns
        # the sim_sum reductions into a psum over ICI.
        self.shard_views = shard_views and model

    def _constrain(self, x, spec):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec))

    def batch(self, x):
        return self._constrain(x, P("data"))

    def volume(self, x):
        """(B, D, H, W, ...) cost volume — batch over data; depth
        hypotheses over model (shard_depth), else rows over model
        (shard_spatial: the T&T-resolution HBM-relief layout, SURVEY
        §5.7 — the 3-D U-Net / CSP convs get their halos from GSPMD)."""
        if self.shard_depth:
            rest = [None] * (x.ndim - 2)
            return self._constrain(x, P("data", "model", *rest))
        if self.shard_spatial:
            rest = [None] * (x.ndim - 3)
            return self._constrain(x, P("data", None, "model", *rest))
        return self._constrain(x, P("data"))

    def spatial(self, x):
        """Feature-layout tensors — batch over data, image rows over
        model.  Rank 4 (B, H, W, C) and rank 5 (B, V, H, W, C) both
        shard the H axis (always ndim-3); under a view policy, rank-5
        tensors shard the V axis instead."""
        if self.shard_views and x.ndim == 5:
            return self._constrain(x, P("data", "model"))
        if not self.shard_spatial:
            return self._constrain(x, P("data"))
        spec = [None] * x.ndim
        spec[0] = "data"
        spec[x.ndim - 3] = "model"
        return self._constrain(x, P(*spec))

    def view_batch(self, x):
        """(B·V, H, W, C) view-flattened feature-extractor activations —
        B is the outer factor of the flat axis, so sharding it over the
        ('data', 'model') tuple puts batch on data and views on model.
        Anchoring the FPN's input AND outputs with this spec makes GSPMD
        shard the whole per-view conv chain (the T&T HBM hot spot)."""
        if self.shard_views:
            return self._constrain(x, P(("data", "model")))
        if self.shard_spatial:
            spec = [None] * x.ndim
            spec[0] = "data"
            spec[x.ndim - 3] = "model"
            return self._constrain(x, P(*spec))
        return self._constrain(x, P("data")) if self.mesh.shape.get(
            "data", 1) > 1 else x

    def views_volume(self, x):
        """(B, V, D, H, W) per-view correlation stack — the largest warp
        temporary.  View policy shards V (axis 1; the weighted view
        reduction right after becomes a psum); depth policy shards D
        (axis 2); spatial policy shards rows (axis 3); GSPMD propagates
        the constraint back into the per-view gathers."""
        if self.shard_views:
            return self._constrain(x, P("data", "model", None, None, None))
        if self.shard_depth:
            return self._constrain(x, P("data", None, "model", None, None))
        if self.shard_spatial:
            return self._constrain(x, P("data", None, None, "model", None))
        return self._constrain(x, P("data"))


_tls = threading.local()


def _active() -> Optional[ShardingPolicy]:
    return getattr(_tls, "policy", None)


@contextlib.contextmanager
def use_policy(policy: Optional[ShardingPolicy]):
    prev = _active()
    _tls.policy = policy
    try:
        yield
    finally:
        _tls.policy = prev


def constrain_batch(x):
    pol = _active()
    return pol.batch(x) if pol is not None else x


def constrain_volume(x):
    pol = _active()
    return pol.volume(x) if pol is not None else x


def constrain_spatial(x):
    pol = _active()
    return pol.spatial(x) if pol is not None else x


def constrain_views_volume(x):
    pol = _active()
    return pol.views_volume(x) if pol is not None else x


def constrain_view_batch(x):
    pol = _active()
    return pol.view_batch(x) if pol is not None else x
