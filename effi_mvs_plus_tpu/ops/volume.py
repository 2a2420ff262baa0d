"""Probability-volume ops: expectation depth and photometric confidence.

Reference semantics: ``depth_regression`` (module.py:518-524) and the
4-tap confidence (Effi_MVS_plus.py:83-88).  The confidence's
``torch.gather`` at the expected-depth index is replaced by a dense
one-hot contraction over the (small) depth axis — no gathers on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def depth_regression(prob, depth_values):
    """Expectation over the depth axis.

    prob: (B, D, H, W); depth_values: (B, D) or (B, D, H, W).
    Returns (B, H, W).
    """
    if depth_values.ndim == 2:
        depth_values = depth_values[:, :, None, None]
    return jnp.sum(prob * depth_values, axis=1)


def photometric_confidence(prob):
    """Sum of the 4 probability bins straddling the expected depth index.

    Replicates Effi_MVS_plus.py:83-88: pad the depth axis with (1, 2)
    zeros, 4-wide sliding sum, then read it out at
    ``int(expectation(arange(D)))`` clamped to [0, D-1] (float->long in
    torch truncates toward zero).  Runs under stop_gradient like the
    reference's ``torch.no_grad()`` block.
    """
    prob = lax.stop_gradient(prob)
    B, D, H, W = prob.shape
    padded = jnp.pad(prob, ((0, 0), (1, 2), (0, 0), (0, 0)))
    sum4 = lax.reduce_window(padded, 0.0, lax.add,
                             (1, 4, 1, 1), (1, 1, 1, 1), "VALID")
    idx_f = jnp.sum(prob * jnp.arange(D, dtype=prob.dtype)[None, :, None, None],
                    axis=1)
    idx = jnp.clip(idx_f.astype(jnp.int32), 0, D - 1)
    onehot = (jnp.arange(D, dtype=jnp.int32)[None, :, None, None]
              == idx[:, None]).astype(prob.dtype)
    return jnp.sum(sum4 * onehot, axis=1)
