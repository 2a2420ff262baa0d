"""Depth-axis volume resampling — gather-free.

The reference resamples its stored cost volumes along the depth axis with a
1-D ``grid_sample`` on (B·H·W, 1, 1, D) "images"
(/root/reference/models/Effi_MVS_plus.py:102-134 ``pro_bilinear_sampler``).
On TPU a 2-tap gather at per-pixel dynamic positions is the wrong shape for
the hardware; since D is small (8-96) we instead evaluate the *dense*
bilinear weight row ``relu(1 - |x - d|)`` over all D bins and contract.
This is a pure VPU multiply-reduce with zero gathers, and it reproduces the
`align_corners=True` + zeros-padding semantics bit-for-bit: for in-range x
exactly two weights are non-zero (the two taps), out-of-range taps get
weight 0 with no renormalisation.
"""

from __future__ import annotations

import jax.numpy as jnp

from effi_mvs_plus_tpu.core import geometry


def resample_depth_axis(vol, x):
    """Linearly interpolate ``vol`` along its depth axis at positions ``x``.

    vol: (B, D, H, W) — stored volume;
    x:   (B, K, H, W) — continuous positions in volume index space [0, D-1].
    Returns (B, K, H, W).
    """
    D = vol.shape[1]
    d = jnp.arange(D, dtype=x.dtype)
    w = jnp.maximum(1.0 - jnp.abs(x[..., None] - d), 0.0)   # (B,K,H,W,D)
    return jnp.einsum("bkhwd,bdhw->bkhw", w, vol.astype(x.dtype))


def resample_volume_at_depths(vol, depth_samples, depth_min, depth_max):
    """Resample a stored volume at actual-depth hypotheses.

    The volume's bins are uniform in *normalised disparity* over its own
    depth range [depth_min, depth_max] (bin 0 = depth_max, bin D-1 =
    depth_min), so the lookup position is
    ``depth_to_disp(depth, depth_min, depth_max) * (D-1)`` — the reference's
    Effi_MVS_plus.py:118-134.

    vol: (B, D, H, W); depth_samples: (B, K, H, W) actual depths;
    depth_min, depth_max: broadcastable (e.g. (B,1,1,1)).
    Returns (B, K, H, W).
    """
    D = vol.shape[1]
    disp = geometry.depth_to_disp(depth_samples, depth_min, depth_max)
    return resample_depth_axis(vol, disp * (D - 1))
