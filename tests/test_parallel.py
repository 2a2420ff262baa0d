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


def test_view_sharded_forward_matches_single_device():
    """View-axis sharding (SURVEY §5.7): FPN + per-view sims sharded over
    'model', the weighted view reduction becomes a psum — numerics must
    match the unsharded forward.  V=3 over model=2 also exercises GSPMD's
    uneven-shard padding (the T&T case is V=11)."""
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
    policy = ShardingPolicy(mesh, shard_depth=False, shard_views=True)
    p_r = replicate(params, mesh)
    batch = shard_batch({"imgs": imgs, "dv": dv, **proj_ms}, mesh)
    with use_policy(policy):
        got = jax.jit(f)(p_r, batch["imgs"],
                         {k: batch[k] for k in ("stage1", "stage2",
                                                "stage3")},
                         batch["dv"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-4)


def test_engine_shard_views_matches_plain():
    """InferenceEngine(shard_views=True): all 8 virtual devices cooperate
    on one B=1 map (the T&T deployment mode); output must match the
    unsharded engine."""
    from effi_mvs_plus_tpu.infer import InferenceEngine

    cfg = EffiMVSConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    imgs, proj_ms, dv = _inputs(B=1)
    batch = {"imgs": imgs, "proj_matrices": proj_ms, "depth_values": dv}

    d0, c0 = InferenceEngine(params, cfg).infer_batch(batch)
    d1, c1 = InferenceEngine(params, cfg, shard_views=True).infer_batch(batch)
    np.testing.assert_allclose(d1, d0, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(c1, c0, atol=1e-4)


def test_dryrun_multichip_entrypoint():
    graft.dryrun_multichip(8)
