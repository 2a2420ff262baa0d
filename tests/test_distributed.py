"""Distributed-runtime helpers (single-process semantics on the 8-device
CPU mesh) and checkpoint backends."""

import os

import jax
import numpy as np
import pytest

from effi_mvs_plus_tpu.parallel import (barrier, global_mesh,
                                        host_local_batch, initialize,
                                        is_main, mean_metrics, partition)
from effi_mvs_plus_tpu.train import trainer as T


def test_initialize_noop_single_process(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "NUM_PROCESSES", "WORLD_SIZE", "PROCESS_ID", "RANK"):
        monkeypatch.delenv(var, raising=False)
    assert initialize() is False
    assert is_main()


def test_global_mesh_covers_all_devices():
    m = global_mesh()
    assert m.shape["data"] * m.shape["model"] == len(jax.devices())
    m2 = global_mesh(model=2)
    assert m2.shape["model"] == 2


def test_host_local_batch_shards_leading_axis():
    m = global_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2),
             "s": np.float32(3.0)}
    g = host_local_batch(batch, m)
    assert g["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])


def test_mean_metrics_and_partition_and_barrier():
    out = mean_metrics({"loss": 2.0, "err": np.float32(1.5)})
    assert out == {"loss": 2.0, "err": 1.5}
    items = list(range(10))
    parts = [partition(items, 3, p) for p in range(3)]
    assert sorted(sum(parts, [])) == items
    assert parts[0] == [0, 3, 6, 9]
    barrier()  # no-op single process


def test_checkpoint_roundtrip_pickle(tmp_path):
    params = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
              "b": {"w": np.ones((4,), np.float32)}}
    opt = {"count": np.asarray(7)}
    p = str(tmp_path / "model_000003.ckpt")
    T.save_checkpoint(p, params, opt, epoch=3)
    payload = T.load_checkpoint(p)
    assert payload["epoch"] == 3
    np.testing.assert_array_equal(payload["params"]["a"], params["a"])
    assert T.latest_checkpoint(str(tmp_path)) == p


def test_checkpoint_roundtrip_orbax(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    params = {"a": np.arange(6, dtype=np.float32).reshape(2, 3)}
    opt = {"count": np.asarray(7)}
    p = str(tmp_path / "model_000005")
    T.save_checkpoint(p, params, opt, epoch=5)
    payload = T.load_checkpoint(p)
    assert payload["epoch"] == 5
    np.testing.assert_array_equal(np.asarray(payload["params"]["a"]),
                                  params["a"])
    assert T.latest_checkpoint(str(tmp_path)) == p
