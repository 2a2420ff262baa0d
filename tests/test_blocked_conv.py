"""Blocked (space-to-depth) conv == plain torch-semantics conv, for every
deployed conv geometry (ops/blocked_conv.py).

The blocked path must be EXACT up to float reassociation: same taps,
same zeros-padding semantics, any spatial size (internal zero-pad to
block multiples must not change edge outputs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from effi_mvs_plus_tpu import nn
from effi_mvs_plus_tpu.ops import blocked_conv as bc

jax.config.update("jax_enable_x64", False)


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


# (k, stride, padding, I, O, out_block, H, W) — the 2-D geometries the
# model deploys (blocks.py): 3x3 s1 p1 level convs, 5x5 s2 p2
# downsamples, 1x1 heads, 7x7 p3 depth encoder, 3x3 p1 FPN heads.
CASES_2D = [
    (3, 1, 1, 8, 8, (2, 4), 48, 40),
    (3, 1, 1, 16, 16, (2, 2), 24, 20),
    (3, 1, 1, 3, 8, (4, 4), 32, 32),
    (5, 2, 2, 8, 16, (1, 2), 48, 40),
    (5, 2, 2, 16, 32, (2, 2), 48, 40),
    (1, 1, 0, 6, 48, (2, 4), 24, 16),
    (7, 1, 3, 1, 16, (2, 4), 40, 32),
    (3, 1, 1, 64, 8, (2, 2), 24, 24),
]


@pytest.mark.parametrize("k,s,p,I,O,ob,H,W", CASES_2D)
def test_conv2d_blocked_matches_plain(k, s, p, I, O, ob, H, W):
    rng = np.random.default_rng(hash((k, s, p, I, O)) % 2**32)
    x = _rand(rng, 2, H, W, I)
    w = _rand(rng, k, k, I, O) * 0.1
    b = _rand(rng, O)
    ref = nn.conv2d(x, w, b, stride=s, padding=p)
    got = bc.conv_blocked(x, w, b, stride=s, padding=p, out_block=ob)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("k,s,p,I,O,ob,H,W", [
    # non-divisible spatial sizes: internal zero-pad must stay exact
    (3, 1, 1, 8, 8, (2, 4), 45, 39),
    (5, 2, 2, 8, 16, (1, 2), 46, 38),
])
def test_conv2d_blocked_nondivisible(k, s, p, I, O, ob, H, W):
    rng = np.random.default_rng(3)
    x = _rand(rng, 1, H, W, I)
    w = _rand(rng, k, k, I, O) * 0.1
    ref = nn.conv2d(x, w, None, stride=s, padding=p)
    got = bc.conv_blocked(x, w, None, stride=s, padding=p, out_block=ob)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


# (kd cases) 3-D: CSP / cost-reg geometries — full-D fold (+ spatial
# blocks), spatial stride, and D-strided cost_reg levels left unfolded.
CASES_3D = [
    # k, stride, padding, I, O, out_block(D,h,w), D, H, W
    (3, (1, 1, 1), 1, 1, 8, (8, 1, 2), 8, 24, 20),      # CSP conv_cost
    (3, (1, 2, 2), 1, 1, 8, (8, 1, 1), 8, 24, 20),      # CSP conv0
    (3, (1, 1, 1), 1, 16, 8, (8, 1, 1), 8, 12, 16),     # CSP conv1
    (3, (1, 1, 1), 1, 8, 8, (4, 2, 2), 8, 16, 16),      # partial D fold
    (3, (2, 2, 2), 1, 8, 16, (4, 1, 2), 8, 16, 16),     # cost_reg down
]


@pytest.mark.parametrize("k,s,p,I,O,ob,D,H,W", CASES_3D)
def test_conv3d_blocked_matches_plain(k, s, p, I, O, ob, D, H, W):
    rng = np.random.default_rng(hash((k, I, O, D)) % 2**32)
    x = _rand(rng, 2, D, H, W, I)
    w = _rand(rng, k, k, k, I, O) * 0.1
    b = _rand(rng, O)
    ref = nn.conv3d(x, w, b, stride=s, padding=p)
    got = bc.conv_blocked(x, w, b, stride=s, padding=p, out_block=ob)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("s,op,ob", [
    ((1, 2, 2), (0, 1, 1), (8, 2, 2)),   # CSP conv2 geometry
    ((1, 2, 2), (0, 1, 1), (8, 4, 4)),
    ((2, 2, 2), (1, 1, 1), (8, 2, 2)),   # cost_reg deconv geometry
])
def test_conv_transpose3d_blocked(s, op, ob):
    rng = np.random.default_rng(11)
    D, H, W, I, O = 8 if s[0] == 1 else 4, 12, 16, 8, 1
    x = _rand(rng, 2, D, H, W, I)
    w = _rand(rng, 3, 3, 3, I, O) * 0.1
    b = _rand(rng, O)
    ref = nn.conv_transpose3d(x, w, b, stride=s, padding=1,
                              output_padding=op)
    got = bc.conv_blocked(x, w, b, stride=s, padding=1, out_block=ob,
                          transpose=True, output_padding=op)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_blocked_chain_matches_level():
    """A conv0-level chain (two 3x3 s1 p1 conv+relu) computed entirely in
    blocked space equals the plain chain — the integration pattern
    feature_net uses (one s2d per level, blocked convs inside)."""
    rng = np.random.default_rng(5)
    x = _rand(rng, 2, 32, 40, 3)
    w0 = _rand(rng, 3, 3, 3, 8) * 0.2
    w1 = _rand(rng, 3, 3, 8, 8) * 0.2
    ref = jax.nn.relu(nn.conv2d(jax.nn.relu(
        nn.conv2d(x, w0, padding=1)), w1, padding=1))

    ob = (2, 4)
    xb = bc.space_to_depth(x, ob)
    nb = xb.shape[1:-1]
    yb = jax.nn.relu(bc.blocked_conv_raw(xb, w0, (1, 1), (1, 1), ob, nb,
                                         (32, 40)))
    yb = jax.nn.relu(bc.blocked_conv_raw(yb, w1, (1, 1), (1, 1), ob,
                                         yb.shape[1:-1], (32, 40)))
    got = bc.depth_to_space(yb, ob, 8, crop=(32, 40))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_bn_blocked_train_and_eval_match():
    """bn_blocked == unblocked batch_norm in both modes (stats reduce
    over block positions too)."""
    rng = np.random.default_rng(7)
    x = _rand(rng, 4, 16, 24, 8)
    p = {"weight": _rand(rng, 8) + 1.0, "bias": _rand(rng, 8),
         "running_mean": _rand(rng, 8), "running_var": jnp.abs(_rand(rng, 8)) + 0.5}
    ob = (2, 4)
    xb = bc.space_to_depth(x, ob)
    # eval mode
    ref = nn.batch_norm(x, p, None)
    got = bc.depth_to_space(bc.bn_blocked(xb, p, None, ob), ob, 8,
                            crop=(16, 24))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # train mode: same batch stats + same recorded running stats
    ctx_a = nn.Ctx(train=True)
    ctx_b = nn.Ctx(train=True)
    with ctx_a.scope("l"):
        ref = nn.batch_norm(x, p, ctx_a)
    with ctx_b.scope("l"):
        got_b = bc.bn_blocked(xb, p, ctx_b, ob)
    got = bc.depth_to_space(got_b, ob, 8, crop=(16, 24))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    assert ctx_a.updates.keys() == ctx_b.updates.keys() and ctx_a.updates
    for k in ctx_a.updates["l"]:
        np.testing.assert_allclose(
            np.asarray(ctx_a.updates["l"][k]),
            np.asarray(ctx_b.updates["l"][k]), atol=1e-5, rtol=1e-5)
