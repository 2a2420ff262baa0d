"""Multi-stage supervised loss + depth metrics.

Semantics of the reference ``mvs_loss``
(/root/reference/models/module.py:526-552) with the 13-prediction ->
GT-stage mapping built by its training driver (train.py:246,313):
predictions [init, s1 x3 iters, s1 up, s2 x3, s2 up, s3 x3, s3 up] are
supervised against GT pyramids stage1..4 as [1,1,1,1,2,2,2,2,3,3,3,3,4].
Per-prediction loss is mean smooth-L1 over valid (mask>0.5) pixels;
weights: 1.0 for the first prediction, ``loss_rate**(L-i-1)`` otherwise
(deployed loss_rate=1.0 => all ones).

Masked means are computed with where-sums (no boolean indexing — static
shapes for XLA).
"""

from __future__ import annotations

import jax.numpy as jnp

PRED_STAGE_MAP = (1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4)


def smooth_l1(x, y):
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def masked_mean(values, mask):
    w = mask.astype(values.dtype)
    return jnp.sum(values * w) / jnp.maximum(jnp.sum(w), 1.0)


def mvs_loss(depth_preds, depth_gt_stages, mask_stages, loss_rate=1.0,
             stage_map=PRED_STAGE_MAP):
    """depth_preds: list of (B,h,w); depth_gt_stages/mask_stages:
    {'stage1'..'stage4': (B,h,w)}.  Returns (total, per-pred dict)."""
    total = 0.0
    per = {}
    L = len(depth_preds)
    for i, pred in enumerate(depth_preds):
        gt = depth_gt_stages[f"stage{stage_map[i]}"]
        mask = mask_stages[f"stage{stage_map[i]}"] > 0.5
        li = masked_mean(smooth_l1(pred, gt), mask)
        per[f"l{i}"] = li
        weight = 1.0 if i == 0 else loss_rate ** (L - i - 1)
        total = total + weight * li
    return total, per


def _per_image_mean(values, sel):
    """Mean over selected pixels per image, then mean over batch — the
    reference computes every metric per image and stacks
    (utils.py:126-137 compute_metrics_for_each_image)."""
    axes = tuple(range(1, values.ndim))
    w = sel.astype(values.dtype)
    per_img = jnp.sum(values * w, axes) / jnp.maximum(jnp.sum(w, axes), 1.0)
    return jnp.mean(per_img)


def abs_depth_error(pred, gt, mask, band=None):
    """Reference AbsDepthError_metrics (utils.py:151-160): mean |err| over
    masked pixels; with ``band=(lo, hi)`` restricted to errors in
    [lo, hi] (the banded variants of train.py:332-338), 0 when the band
    selects nothing."""
    err = jnp.abs(pred - gt)
    sel = mask > 0.5
    if band is not None:
        sel = sel & (err >= band[0]) & (err <= band[1])
    return _per_image_mean(err, sel)


def threshold_error(pred, gt, mask, thresh):
    """Fraction of valid pixels with |err| > thresh, per image then
    batch-meaned (reference utils.py:139-148 Thres_metrics)."""
    err = jnp.abs(pred - gt)
    return _per_image_mean((err > thresh).astype(jnp.float32), mask > 0.5)
