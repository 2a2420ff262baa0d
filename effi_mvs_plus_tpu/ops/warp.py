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

    One ``lax.gather`` of a (2, 2, C) block per sample from a zero-padded
    copy of the map (instead of four scalar-indexed taps): 4x fewer gather
    indices, and each block is a contiguous 2-row read.  Zeros padding
    falls out of the 1-pixel zero border; samples whose 2x2 support lies
    fully outside [-1, S-1+1) are masked to zero (any partially-inside
    support reads the correct zeros from the border).
    """
    B, H, W, C = fea.shape
    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    wx = (px - x0f).astype(fea.dtype)                   # (B, N)
    wy = (py - y0f).astype(fea.dtype)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    padded = jnp.pad(fea, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # support fully valid after clip <=> x0 in [-1, W-1], y0 in [-1, H-1]
    valid = ((x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1))
    xs = jnp.clip(x0 + 1, 0, W)       # padded coords; start W keeps the
    ys = jnp.clip(y0 + 1, 0, H)       # 2-wide block inside width W+2

    starts = jnp.stack([ys, xs], axis=-1)               # (B, N, 2)
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    blocks = lax.gather(
        padded, starts, dnums, slice_sizes=(1, 2, 2, C),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)   # (B, N, 2, 2, C)

    w00 = (1 - wx) * (1 - wy)
    w01 = wx * (1 - wy)
    w10 = (1 - wx) * wy
    w11 = wx * wy
    out = (blocks[:, :, 0, 0] * w00[..., None]
           + blocks[:, :, 0, 1] * w01[..., None]
           + blocks[:, :, 1, 0] * w10[..., None]
           + blocks[:, :, 1, 1] * w11[..., None])
    return jnp.where(valid[..., None], out, 0).astype(fea.dtype)


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
