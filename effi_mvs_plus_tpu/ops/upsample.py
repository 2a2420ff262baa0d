"""RAFT-style convex upsampling, TPU-native.

The reference implements this with ``F.unfold`` + a 7-D view
(/root/reference/models/Effi_MVS_plus.py:167-178), a pattern XLA fuses
poorly.  Here the 3x3 neighbourhood is materialised by 9 static pad+slice
shifts (free under XLA — they fuse into the weighted sum) and the convex
combination is one einsum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shifted(x, dy, dx):
    """x: (B,H,W) -> x shifted so out[h,w] = x[h+dy, w+dx], zero padded."""
    B, H, W = x.shape
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    return jax.lax.dynamic_slice(p, (0, 1 + dy, 1 + dx), (B, H, W))


def convex_upsample(value, mask, ratio):
    """Upsample (B,H,W) -> (B, ratio*H, ratio*W) by a learned convex
    combination over each coarse pixel's 3x3 neighbourhood.

    mask: (B, H, W, 9*ratio*ratio) — raw logits from the mask head, channel
    layout [k, ry, rx] with k the neighbourhood index in row-major (dy,dx)
    order, matching the torch ``view(N,1,9,r,r,H,W)`` split.
    """
    B, H, W = value.shape
    r = ratio
    m = mask.reshape(B, H, W, 9, r, r)
    m = jax.nn.softmax(m, axis=3)

    nb = jnp.stack([_shifted(value, dy, dx)
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                   axis=-1)                                   # (B,H,W,9)
    up = jnp.einsum("bhwkyx,bhwk->bhwyx", m, nb)              # (B,H,W,r,r)
    return up.transpose(0, 1, 3, 2, 4).reshape(B, H * r, W * r)
