"""Differentiable homography warp + group correlation.

TPU-native formulation of the reference's plane-sweep warp
(/root/reference/models/module.py:303-344 ``homo_warping_new`` — a
``F.grid_sample`` with ``align_corners=True`` and zeros padding) and the
per-view group correlation (Effi_MVS_plus.py:38-40).

Bilinear sampling semantics replicated exactly:

* ``align_corners=True``: normalised grid in [-1,1] maps linearly onto
  pixel centres [0, S-1] — i.e. sampling happens directly in pixel
  coordinates.
* ``padding_mode='zeros'``: each of the four bilinear taps contributes 0
  when its integer coordinate falls outside the image; weights are NOT
  renormalised.

The gather is expressed as one flattened `take_along_axis` per tap so XLA
lowers it to a native dynamic-gather (the coordinates/weights are computed
under `stop_gradient`, matching the reference's ``torch.no_grad()`` grid
block, module.py:313).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from effi_mvs_plus_tpu.core import geometry


def bilinear_gather(fea, px, py):
    """Sample ``fea`` at continuous pixel coords with torch
    grid_sample(mode='bilinear', padding_mode='zeros', align_corners=True)
    semantics.

    fea: (B, H, W, C); px, py: (B, N) pixel coordinates.
    Returns (B, N, C).

    Four per-tap ``take_along_axis`` gathers on the row-flattened map.  An
    earlier version gathered one (2, 2, C) block per sample, but TPU pads
    a (2, 2, C) gather result to full (sublane, lane) tiles — 64x memory
    amplification — which blows up buffer assignment at large shapes (the
    compile helper dies at stage-3 eval shapes with B>=6).  Flat (1, C)
    taps pad only the channel axis and compile at every deployed shape;
    zeros padding is exact per tap (an out-of-image tap contributes 0,
    weights NOT renormalised — module.py:340-341 semantics).
    """
    B, H, W, C = fea.shape
    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    wx = (px - x0f).astype(fea.dtype)                   # (B, N)
    wy = (py - y0f).astype(fea.dtype)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    flat = fea.reshape(B, H * W, C)

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.where(inb, yi * W + xi, 0)
        v = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return jnp.where(inb[..., None], v, 0)

    w00 = ((1 - wx) * (1 - wy))[..., None]
    w01 = (wx * (1 - wy))[..., None]
    w10 = ((1 - wx) * wy)[..., None]
    w11 = (wx * wy)[..., None]
    out = (tap(x0, y0) * w00 + tap(x0 + 1, y0) * w01
           + tap(x0, y0 + 1) * w10 + tap(x0 + 1, y0 + 1) * w11)
    return out.astype(fea.dtype)


def homo_warp(src_fea, rot, trans, depth):
    """Warp source features onto the ref view at per-pixel depth hypotheses.

    src_fea: (B, H, W, C); rot: (B,3,3); trans: (B,3);
    depth: (B, D, H, W) actual depths.  Returns (B, D, H, W, C).
    """
    B, H, W, C = src_fea.shape
    D = depth.shape[1]
    px, py = geometry.project_to_src(rot, trans, depth, H, W)
    px = lax.stop_gradient(px)
    py = lax.stop_gradient(py)
    out = bilinear_gather(src_fea, px.reshape(B, -1), py.reshape(B, -1))
    return out.reshape(B, D, H, W, C)


def warp_correlate(ref_fea, src_fea, rot, trans, depth, groups=1):
    """Fused warp + group correlation for one source view.

    Computes mean over channels-per-group of (warped_src * ref) at every
    depth hypothesis — the reference's ``similarity`` tensor
    (Effi_MVS_plus.py:39-40) — without keeping the warped volume around.

    ref_fea, src_fea: (B, H, W, C); depth: (B, D, H, W).
    Returns (B, D, H, W, G).
    """
    B, H, W, C = ref_fea.shape
    D = depth.shape[1]
    warped = homo_warp(src_fea, rot, trans, depth)         # (B,D,H,W,C)
    w = warped.reshape(B, D, H, W, groups, C // groups)
    r = ref_fea.reshape(B, 1, H, W, groups, C // groups)
    return jnp.mean(w * r, axis=-1)


def warp_correlate_views(ref_fea, src_feas, rots, transs, depth,
                         view_weights=None, groups=1):
    """Accumulate the view-weighted correlation over all source views with a
    `lax.scan`, so only one warped volume is live at a time (the TPU
    analogue of the reference's per-view Python loop with aggressive `del`,
    Effi_MVS_plus.py:32-71).

    src_feas: (V, B, H, W, C); rots: (V, B, 3, 3); transs: (V, B, 3);
    view_weights: (V, B, H, W) or None.
    Returns (similarity_sum (B,D,H,W,G), weight_sum (B,1,H,W,1) or None).
    """
    V = src_feas.shape[0]

    if view_weights is None:
        def body(carry, xs):
            src, rot, tr = xs
            sim = warp_correlate(ref_fea, src, rot, tr, depth, groups)
            return carry + sim, None
        init = jnp.zeros(ref_fea.shape[:1] + depth.shape[1:2]
                         + ref_fea.shape[1:3] + (groups,), ref_fea.dtype)
        total, _ = lax.scan(body, init, (src_feas, rots, transs))
        return total, None

    def body(carry, xs):
        sim_sum, w_sum = carry
        src, rot, tr, vw = xs
        sim = warp_correlate(ref_fea, src, rot, tr, depth, groups)
        vw_ = vw[:, None, :, :, None]                      # (B,1,H,W,1)
        return (sim_sum + sim * vw_, w_sum + vw_), None

    B, H, W, _ = ref_fea.shape
    D = depth.shape[1]
    init = (jnp.zeros((B, D, H, W, groups), ref_fea.dtype),
            jnp.zeros((B, 1, H, W, 1), ref_fea.dtype))
    (sim_sum, w_sum), _ = lax.scan(
        body, init, (src_feas, rots, transs, view_weights))
    return sim_sum, w_sum
