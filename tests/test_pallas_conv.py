"""Fused 3x3 conv(+folded-BN)+ReLU chain (ops/pallas_conv.py) vs the XLA
conv path, interpret mode on CPU — including the full feature_net with
real checkpoint weights (BN folding must reproduce eval-mode BatchNorm
exactly)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("B,H,W,chans", [(2, 13, 17, (3, 8, 8)),
                                         (1, 40, 9, (8, 16)),
                                         (1, 9, 11, (3, 8, 8, 16))])
def test_chain_parity(B, H, W, chans):
    from effi_mvs_plus_tpu import nn
    from effi_mvs_plus_tpu.ops import pallas_conv as pc
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, chans[0])), jnp.float32)
    specs, ref = [], x
    for ci, co in zip(chans[:-1], chans[1:]):
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.2,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal(co) * 0.1, jnp.float32)
        specs.append((w, b))
        ref = jax.nn.relu(nn.conv2d(ref, w, b, padding=1))
    got = pc.conv_bn_relu_chain(x, specs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_feature_net_fused_matches_xla_on_checkpoint():
    """Whole FPN with model_dtu weights: the fused-stem path (forced
    'pallas', interpreted off-TPU) must match the XLA path at eval-mode
    BN semantics."""
    from effi_mvs_plus_tpu.io import load_torch_checkpoint
    from effi_mvs_plus_tpu.models import blocks
    params = load_torch_checkpoint(
        "/root/reference/checkpoints/Effi_MVS_plus/model_dtu.ckpt")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 96, 3)), jnp.float32)
    ref = blocks.feature_net(x, params["feature"], None, stem_impl="xla")
    got = blocks.feature_net(x, params["feature"], None,
                             stem_impl="pallas")
    for k in ref:
        a, b = np.asarray(ref[k]), np.asarray(got[k])
        assert a.shape == b.shape
        np.testing.assert_allclose(b, a, atol=2e-4), k
