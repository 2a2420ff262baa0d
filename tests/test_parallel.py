"""Multi-device sharding: mesh construction and numerical equivalence of
the sharded forward/train step vs single-device (8 virtual CPU devices
from conftest)."""

import numpy as np
import jax
import jax.numpy as jnp

from effi_mvs_plus_tpu.models import EffiMVSConfig, forward, init_params
from effi_mvs_plus_tpu.parallel import (make_mesh, shard_batch, replicate,
                                        ShardingPolicy, use_policy)

import __graft_entry__ as graft


def _inputs(B=2):
    return graft._tiny_inputs(batch=B, views=3, height=64, width=96)


def test_mesh_shapes():
    m = make_mesh(data=4, model=2)
    assert dict(m.shape) == {"data": 4, "model": 2}
    m2 = make_mesh(model=1)
    assert m2.shape["data"] == len(jax.devices())


def test_sharded_forward_matches_single_device():
    cfg = EffiMVSConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    imgs, proj_ms, dv = _inputs(B=4)

    def f(p, i, pr, d):
        out = forward(p, i, pr, d, cfg)
        return out["depth"][-1]

    ref = jax.jit(f)(params, jnp.asarray(imgs),
                     {k: jnp.asarray(v) for k, v in proj_ms.items()},
                     jnp.asarray(dv))

    mesh = make_mesh(data=4, model=2)
    policy = ShardingPolicy(mesh, shard_depth=True)
    p_r = replicate(params, mesh)
    batch = shard_batch({"imgs": imgs, "dv": dv, **proj_ms}, mesh)
    with use_policy(policy):
        jf = jax.jit(f)
        got = jf(p_r, batch["imgs"],
                 {k: batch[k] for k in ("stage1", "stage2", "stage3")},
                 batch["dv"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-4)


def test_dryrun_multichip_entrypoint():
    graft.dryrun_multichip(8)
