"""Grouped-BN statistic semantics vs torch's sequential per-view calls.

The reference extracts per-view features / per-view PixelwiseNet weights
in a Python loop, so each view is a separate BatchNorm2d forward that
(a) normalizes with THAT view's batch stats and (b) advances the running
stats once per view in order (/root/reference/models/Effi_MVS_plus.py:432-434,
43-46).  We batch all views through one conv launch and restore those
semantics with ``nn.stat_groups`` (effi_mvs_plus_tpu/nn.py): per-group
normalization plus the closed-form momentum chain
``r' = (1-m)^g r + m * sum_v (1-m)^(g-1-v) stat_v``.

This pins both halves against torch directly — test_grad_parity.py covers
the gradients but skips the running-stat buffers.
"""

import numpy as np
import jax
import jax.numpy as jnp

from effi_mvs_plus_tpu import nn


def _params(C, rng):
    return {
        "weight": jnp.asarray(rng.normal(1.0, 0.1, C).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(0.0, 0.1, C).astype(np.float32)),
        "running_mean": jnp.asarray(rng.normal(0, 1, C).astype(np.float32)),
        "running_var": jnp.asarray(
            rng.uniform(0.5, 2.0, C).astype(np.float32)),
    }


def test_grouped_bn_matches_sequential_torch_calls():
    import torch

    B, G, H, W, C = 3, 4, 6, 5, 7      # G = views, deliberately ragged dims
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (B, G, H, W, C)).astype(np.float32)
    p = _params(C, rng)

    # torch: ONE BatchNorm2d module applied per view in order (training)
    tbn = torch.nn.BatchNorm2d(C)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(np.asarray(p["weight"])))
        tbn.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
        tbn.running_mean.copy_(torch.from_numpy(
            np.asarray(p["running_mean"])))
        tbn.running_var.copy_(torch.from_numpy(np.asarray(p["running_var"])))
    tbn.train()
    t_out = []
    with torch.no_grad():
        for g in range(G):
            xv = torch.from_numpy(x[:, g].transpose(0, 3, 1, 2))  # NCHW
            t_out.append(tbn(xv).numpy().transpose(0, 2, 3, 1))
    t_out = np.stack(t_out, axis=1)                       # (B,G,H,W,C)

    # ours: one grouped call on the (B*G, H, W, C) flattened batch
    ctx = nn.Ctx(train=True, rng=jax.random.PRNGKey(0))
    with ctx.scope("bn"), ctx.stat_groups(G):
        j_out = nn.batch_norm(
            jnp.asarray(x.reshape(B * G, H, W, C)), p, ctx)
    j_out = np.asarray(j_out).reshape(B, G, H, W, C)

    np.testing.assert_allclose(j_out, t_out, rtol=2e-5, atol=2e-5)

    upd = ctx.updates["bn"]
    np.testing.assert_allclose(np.asarray(upd["running_mean"]),
                               tbn.running_mean.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["running_var"]),
                               tbn.running_var.numpy(), rtol=1e-5,
                               atol=1e-6)


def test_group_order_is_view_major():
    """Group index must be idx % G of the flattened leading axis (row-major
    (B, G)): shuffling data BETWEEN groups changes per-group stats, while
    shuffling WITHIN a group's batch slots does not."""
    B, G, C = 2, 3, 4
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (B, G, 8, 8, C)).astype(np.float32)
    p = _params(C, rng)

    def run(xx):
        ctx = nn.Ctx(train=True, rng=jax.random.PRNGKey(0))
        with ctx.scope("bn"), ctx.stat_groups(G):
            nn.batch_norm(jnp.asarray(xx.reshape(B * G, 8, 8, C)), p, ctx)
        return np.asarray(ctx.updates["bn"]["running_mean"])

    base = run(x)
    np.testing.assert_allclose(run(x[::-1]), base, rtol=1e-5)   # within-group
    assert np.abs(run(x[:, ::-1]) - base).max() > 1e-4          # across-group
