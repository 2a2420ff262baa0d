"""feature_net(stem_impl='blocked') == plain XLA path, train and eval.

The blocked stem (models/blocks.py::seq_blocked) must be exact up to
float reassociation for BOTH channel profiles the model deploys (the
feature net and the context net share the class,
/root/reference/models/module.py:346-412 / Effi_MVS_plus.py:366), must
collect identical BN batch statistics under a training ctx, and must
fall back to the plain path wherever the block plan does not divide a
level's output size.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from effi_mvs_plus_tpu import nn
from effi_mvs_plus_tpu.models import blocks, init_params

_ALL = init_params(jax.random.PRNGKey(0))


@pytest.mark.parametrize("prof", ["feature", "cnet_depth"])
@pytest.mark.parametrize("H,W", [(64, 128), (32, 64)])
def test_blocked_matches_plain_eval(prof, H, W):
    p = _ALL[prof]
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, H, W, 3)), jnp.float32)
    ref = blocks.feature_net(x, p, None, stem_impl="xla")
    got = blocks.feature_net(x, p, None, stem_impl="blocked")
    for k in ref:
        assert got[k].shape == ref[k].shape
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=3e-5, rtol=1e-4)


def test_blocked_matches_plain_train_stats():
    """Training ctx: same activations AND same recorded BN batch stats."""
    p = _ALL["feature"]
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 64, 128, 3)), jnp.float32)
    ctx_a, ctx_b = nn.Ctx(train=True), nn.Ctx(train=True)
    ref = blocks.feature_net(x, p, ctx_a, stem_impl="xla")
    got = blocks.feature_net(x, p, ctx_b, stem_impl="blocked")
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=1e-4, rtol=1e-3)
    ta, sa = jax.tree_util.tree_flatten(ctx_a.updates)
    tb, sb = jax.tree_util.tree_flatten(ctx_b.updates)
    assert sa == sb and ta
    for a, b in zip(ta, tb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_blocked_grads_match_plain():
    p = _ALL["feature"]
    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 32, 64, 3)), jnp.float32)

    def loss(p, impl):
        out = blocks.feature_net(x, p, None, stem_impl=impl)
        return sum(jnp.sum(jnp.square(v)) for v in out.values())

    ga = jax.grad(lambda p: loss(p, "xla"))(p)
    gb = jax.grad(lambda p: loss(p, "blocked"))(p)
    flat_a = jax.tree_util.tree_leaves(ga)
    flat_b = jax.tree_util.tree_leaves(gb)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-3)


def test_nondivisible_shape_falls_back_exactly():
    """A shape the plan can't block exactly must still produce the plain
    answer (per-level fallback)."""
    p = _ALL["feature"]
    x = jnp.asarray(np.random.default_rng(7).standard_normal(
        (1, 40, 72, 3)), jnp.float32)   # 72/8=9 -> conv0 blocks, conv1 W=36
    ref = blocks.feature_net(x, p, None, stem_impl="xla")
    got = blocks.feature_net(x, p, None, stem_impl="blocked")
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=3e-5, rtol=1e-4)
