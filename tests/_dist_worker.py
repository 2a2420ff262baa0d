"""Worker for the real 2-process jax.distributed test (launched by
tests/test_distributed_multiprocess.py, not collected by pytest).

argv: <rank> <port> <outdir>

Each process owns 2 virtual CPU devices (4 global).  The worker exercises
the full multi-host stack the single-process tests can't: rendezvous,
global mesh over both processes, host-local -> global batch assembly,
symmetric metric reduction, a REAL train step of the flagship model on the
sharded global batch, rank-0 checkpoint guarding, and a barrier.  It
writes a per-leaf parameter fingerprint to <outdir>; the launcher asserts
the two ranks' fingerprints are IDENTICAL — the SPMD contract (identical
dropout fold-ins via the crc32 digest, synced gradient psum) means one
train step must leave both hosts with the same parameters.
"""

import json
import os
import sys

rank = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402
import numpy as np                                           # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from effi_mvs_plus_tpu.parallel import distributed as D      # noqa: E402


def main():
    ok = D.initialize(f"localhost:{port}", 2, rank)
    assert ok, "initialize() must report multi-process"
    assert jax.process_count() == 2
    assert len(jax.local_devices()) == 2
    assert jax.device_count() == 4
    assert D.is_main() == (rank == 0)

    mesh = D.global_mesh()
    assert mesh.shape == {"data": 4, "model": 1}

    # ---- global batch assembly: each host contributes distinct rows ----
    local = np.full((2, 3), float(rank), np.float32)
    g = D.host_local_batch({"x": local}, mesh)["x"]
    assert g.shape == (4, 3), g.shape
    total = float(jax.jit(jnp.sum)(g))
    assert total == 6.0, total          # rank0 rows sum 0, rank1 rows sum 6

    # ---- symmetric scalar reduction ----
    m = D.mean_metrics({"a": float(rank), "b": 10.0 * (rank + 1)})
    assert m == {"a": 0.5, "b": 15.0}, m

    # ---- one real train step on the sharded global batch ----
    import __graft_entry__ as graft
    from effi_mvs_plus_tpu.models import EffiMVSConfig, init_params
    from effi_mvs_plus_tpu.train.optim import make_optimizer
    from effi_mvs_plus_tpu.train.trainer import make_train_step

    B_global, H, W, V = 4, 64, 96, 3
    imgs, proj_ms, dv = graft._tiny_inputs(B_global, V, H, W)
    rng = np.random.default_rng(3)
    scales = {"stage1": 8, "stage2": 4, "stage3": 2, "stage4": 1}
    gt = {k: rng.uniform(430, 930,
                         (B_global, H // s, W // s)).astype(np.float32)
          for k, s in scales.items()}
    mask = {k: np.ones_like(v) for k, v in gt.items()}
    batch_global = {"imgs": imgs, "proj_matrices": proj_ms,
                    "depth_values": dv, "depth": gt, "mask": mask}
    # each host feeds ONLY its slice of the global batch
    lo, hi = rank * 2, rank * 2 + 2
    batch_local = jax.tree.map(lambda x: x[lo:hi], batch_global)
    batch = D.host_local_batch(batch_local, mesh)
    for leaf in jax.tree.leaves(batch):
        assert leaf.shape[0] == B_global

    cfg = EffiMVSConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt, _ = make_optimizer(1e-3, 10, params=params)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)
    params, opt_state, metrics = step(params, opt_state, batch,
                                      jax.random.PRNGKey(7))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)

    # ---- per-leaf fingerprints: must be bitwise identical across hosts
    # (computed in-graph -> replicated scalars both hosts can read) ----
    leaves = jax.tree.leaves_with_path(params)
    names = [jax.tree_util.keystr(p) for p, _ in leaves]

    @jax.jit
    def fingerprint(ps):
        ls = jax.tree.leaves(ps)
        return jnp.stack([
            jnp.stack([jnp.sum(l.astype(jnp.float64)),
                       jnp.sum(jnp.abs(l).astype(jnp.float64)),
                       jnp.min(l).astype(jnp.float64),
                       jnp.max(l).astype(jnp.float64)])
            for l in ls])

    fp = np.asarray(jax.device_get(fingerprint(params)))
    np.save(os.path.join(outdir, f"fp_rank{rank}.npy"), fp)
    with open(os.path.join(outdir, f"meta_rank{rank}.json"), "w") as f:
        json.dump({"loss": loss, "n_leaves": len(names)}, f)

    # ---- rank-0 checkpoint guard ----
    if D.is_main():
        with open(os.path.join(outdir, "ckpt_rank0.txt"), "w") as f:
            f.write("saved by rank 0")
    D.barrier("after-ckpt")
    assert os.path.exists(os.path.join(outdir, "ckpt_rank0.txt"))
    print(f"rank {rank} OK loss={loss:.4f}", flush=True)


if __name__ == "__main__":
    main()
