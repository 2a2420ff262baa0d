"""Depth-quality metrics, including the reference's legacy suite.

Behavioural counterparts of /root/reference/models/loss.py:5-98
(`compute_errors`, `less_one/three_percentage`,
`mvsnet_regression_loss`) — monocular-style error stats (abs_rel, rmse,
delta<1.25^k) and interval-normalised inlier fractions.  Pure jnp; usable
inside jitted eval steps.
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_errors(gt, pred, mask):
    """Masked error statistics (loss.py:5-52).

    gt, pred, mask: (B, H, W).  Returns dict with abs_rel, abs_diff,
    sq_rel (std of abs error over valid pixels), rmse, rmse_log (mean of
    squared log diff, as in the reference), a1, a2, a3.
    """
    gt = gt.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    valid_bool = (gt > 0) & (pred > 0)
    m = (mask > 0.5).astype(jnp.float32) * (pred > 0).astype(jnp.float32)
    n = jnp.sum(m)

    # torch divides masked tensors directly: gt==0 under a valid mask
    # yields an infinite ratio (counted in the denominator, never an
    # inlier) — reproduce that rather than sanitising the division
    ratio1 = jnp.where(m > 0, gt / jnp.where(pred == 0, 1, pred), 0)
    ratio2 = jnp.where(m > 0,
                       jnp.where(gt == 0, jnp.inf, pred / jnp.where(
                           gt == 0, 1, gt)), 0)
    thresh = jnp.maximum(ratio1, ratio2)
    pos = (thresh > 0).astype(jnp.float32)
    a1 = jnp.sum(pos * (thresh < 1.25)) / n
    a2 = jnp.sum(pos * (thresh < 1.25 ** 2)) / n
    a3 = jnp.sum(pos * (thresh < 1.25 ** 3)) / n

    abs_d = jnp.abs(gt - pred)
    rmse = jnp.sqrt(jnp.sum(abs_d ** 2 * m) / n)
    rmse_log = jnp.sum((jnp.log(gt * m + 1e-5) - jnp.log(pred + 1e-5)) ** 2
                       * m) / n
    abs_diff = jnp.sum(abs_d * m) / n
    abs_rel = jnp.sum(abs_d / (gt + 1e-7) * m) / n
    # reference computes std of the *valid* abs errors (loss.py:48)
    nv = jnp.sum(valid_bool)
    mean_v = jnp.sum(jnp.where(valid_bool, abs_d, 0)) / jnp.maximum(nv, 1)
    var_v = jnp.sum(jnp.where(valid_bool, (abs_d - mean_v) ** 2, 0)) \
        / jnp.maximum(nv - 1, 1)
    sq_rel = jnp.sqrt(var_v)
    return {"abs_rel": abs_rel, "abs_diff": abs_diff, "sq_rel": sq_rel,
            "rmse": rmse, "rmse_log": rmse_log, "a1": a1, "a2": a2,
            "a3": a3}


def _less_k_percentage(y_true, y_pred, interval, k):
    m = ((y_true > 0) & (y_pred > 0)).astype(jnp.float32)
    denom = jnp.sum(m) + 1e-7
    inlier = m * (jnp.abs(y_true - y_pred) / interval < k)
    return jnp.sum(inlier) / denom


def less_one_percentage(y_true, y_pred, interval):
    """Fraction of valid pixels within 1 depth interval (loss.py:55-69)."""
    return _less_k_percentage(y_true, y_pred, interval, 1.0)


def less_three_percentage(y_true, y_pred, interval):
    """Fraction within 3 depth intervals (loss.py:72-88)."""
    return _less_k_percentage(y_true, y_pred, interval, 3.0)


def mvsnet_regression_metrics(depth_gt, depth_est, depth_interval):
    """(less-one, less-three) accuracy pair (loss.py:91-98)."""
    return (less_one_percentage(depth_gt, depth_est, depth_interval),
            less_three_percentage(depth_gt, depth_est, depth_interval))
