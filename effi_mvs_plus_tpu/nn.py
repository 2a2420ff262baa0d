"""Minimal functional NN layer library with PyTorch-exact numerics.

Design notes
------------
The whole framework is *functional*: parameters live in plain nested dicts
(pytrees) whose key structure intentionally mirrors the reference
checkpoint's ``state_dict`` names (e.g. ``params['feature']['conv0.0']``
holds ``{'conv': {'weight': ...}, 'bn': {...}}``).  This makes the torch
checkpoint importer a pure re-layout (`io/torch_import.py`) and keeps every
transform (jit / grad / shard_map / vmap) trivially applicable.

Numerics match ``torch.nn`` semantics exactly (reference:
/root/reference/models/module.py:32-250):

* ``conv2d/conv3d``  — explicit symmetric zero padding, floor striding.
* ``conv_transpose3d`` — torch ``ConvTranspose3d(stride, padding,
  output_padding)`` expressed as an input-dilated convolution with the
  spatially-flipped kernel (the canonical XLA formulation, so the TPU
  compiler sees an ordinary convolution it can tile onto the MXU).
* ``batch_norm`` — eps 1e-5; normalises with biased batch variance in
  training, updates running stats with the unbiased variance and torch
  momentum 0.1 (``new = 0.9*old + 0.1*batch``).

Arrays are channels-last (NHWC / NDHWC): the TPU-native layout, with the
lane dimension on the innermost axis.  Weights are stored in the XLA
layouts (HWIO / DHWIO) — the importer transposes once at load time.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

Params = dict


class Ctx:
    """Per-forward mutable context: train flag, BN running-stat updates, RNG.

    In eval mode pass ``None`` everywhere (the default).  In train mode the
    context collects ``path -> {'running_mean','running_var'}`` updates during
    tracing; the train step merges them back into the parameter tree.  Paths
    are built from the same names used to index the param tree, so the update
    dict is a sub-pytree of ``params``.
    """

    def __init__(self, train: bool = False, rng: Optional[jax.Array] = None,
                 momentum: float = 0.1, axis_name: Optional[str] = None):
        self.train = train
        self.rng = rng
        self.momentum = momentum
        self.axis_name = axis_name  # cross-replica BN stats when under shard_map
        self.updates: dict = {}
        self._path: list = []
        self.bn_groups: int = 1

    @contextlib.contextmanager
    def scope(self, name: str):
        self._path.append(str(name))
        try:
            yield
        finally:
            self._path.pop()

    @contextlib.contextmanager
    def stat_groups(self, groups: int):
        """Batch-norm statistic grouping: within this context the leading
        batch axis is treated as (B, groups) flattened row-major and BN
        computes independent statistics per group.

        The reference extracts per-view features in a Python loop
        (`for nview_idx ...: self.feature(img)`,
        /root/reference/models/Effi_MVS_plus.py:432-434), so its train-mode
        BN statistics are PER VIEW.  We batch all views through the FPN in
        one conv launch (the TPU-efficient shape) — this context restores
        the reference's per-view statistic semantics so the optimization
        landscape matches exactly (pinned by tests/test_grad_parity.py).
        """
        prev = self.bn_groups
        self.bn_groups = int(groups)
        try:
            yield
        finally:
            self.bn_groups = prev

    def record_bn(self, mean, var):
        node = self.updates
        for p in self._path[:-1]:
            node = node.setdefault(p, {})
        node[self._path[-1]] = {"running_mean": mean, "running_var": var}

    def dropout_rng(self):
        assert self.rng is not None, "training Ctx needs an rng for dropout"
        # zlib.crc32 is a stable digest: Python's str hash is salted per
        # process (PYTHONHASHSEED), which would trace different fold-in
        # constants on different hosts of an SPMD job and silently diverge
        # the dropout masks (and thus the parameters) across hosts.
        import zlib
        key = self.rng
        for p in self._path:
            key = jax.random.fold_in(key, zlib.crc32(p.encode()) & 0x7FFFFFFF)
        return key


def scope(ctx: Optional[Ctx], name: str):
    """Scope helper usable whether or not a Ctx is active."""
    if ctx is None:
        return contextlib.nullcontext()
    return ctx.scope(name)


def stat_groups(ctx: Optional[Ctx], groups: int):
    """BN stat-grouping helper usable whether or not a Ctx is active."""
    if ctx is None:
        return contextlib.nullcontext()
    return ctx.stat_groups(groups)


def _tuple(v, n):
    if isinstance(v, (tuple, list)):
        assert len(v) == n
        return tuple(v)
    return (v,) * n


def conv2d(x, w, b=None, stride=1, padding=0, dilation=1):
    """x: (B,H,W,I); w: (kh,kw,I,O).  Torch Conv2d semantics."""
    stride = _tuple(stride, 2)
    padding = _tuple(padding, 2)
    dilation = _tuple(dilation, 2)
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride,
        padding=[(p, p) for p in padding],
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv3d(x, w, b=None, stride=1, padding=0):
    """x: (B,D,H,W,I); w: (kd,kh,kw,I,O).  Torch Conv3d semantics."""
    stride = _tuple(stride, 3)
    padding = _tuple(padding, 3)
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose3d(x, w, b=None, stride=1, padding=0, output_padding=0):
    """Torch ``ConvTranspose3d`` as an lhs-dilated convolution.

    ``w`` is stored flipped+transposed at import time as (kd,kh,kw,I,O) so
    this is a single `conv_general_dilated` call (see
    ``io/torch_import.py``).  Output size per dim:
    ``(in-1)*stride - 2*pad + k + output_padding`` (matches
    /root/reference/models/module.py:168-203).
    """
    stride = _tuple(stride, 3)
    padding = _tuple(padding, 3)
    output_padding = _tuple(output_padding, 3)
    k = w.shape[:3]
    pads = [(k[i] - 1 - padding[i], k[i] - 1 - padding[i] + output_padding[i])
            for i in range(3)]
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1, 1),
        padding=pads, lhs_dilation=stride,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def batch_norm(x, p: Params, ctx: Optional[Ctx] = None, eps: float = 1e-5):
    """Torch BatchNorm{2,3}d.  Channel axis is last; stats over all others.

    Under ``ctx.stat_groups(G)`` the leading axis is (B, G) flattened and
    training statistics are computed independently per group g (= per view
    for the view-batched feature net), reproducing the reference's
    per-view-call BN semantics in one batched conv launch.
    """
    g = ctx.bn_groups if (ctx is not None and ctx.train) else 1
    if ctx is not None and ctx.train and g > 1:
        B = x.shape[0] // g
        xg = x.reshape(B, g, *x.shape[1:]).astype(jnp.float32)
        axes = (0,) + tuple(range(2, xg.ndim - 1))
        mean = jnp.mean(xg, axis=axes)                       # (g, C)
        var = jnp.mean(jnp.square(xg), axis=axes) - jnp.square(mean)
        if ctx.axis_name is not None:
            mean = lax.pmean(mean, ctx.axis_name)
            var = lax.pmean(var, ctx.axis_name)
        n = B
        for a in axes[1:]:
            n *= xg.shape[a]
        if ctx.axis_name is not None:
            n *= lax.psum(1, ctx.axis_name)
        unbiased = var * (n / max(n - 1, 1))
        # the reference updates running stats once per view IN ORDER
        # (v = 0..g-1): r' = (1-m)^g r + m * sum_v (1-m)^(g-1-v) stat_v
        m = ctx.momentum
        w = m * (1 - m) ** jnp.arange(g - 1, -1, -1, dtype=jnp.float32)
        ctx.record_bn((1 - m) ** g * p["running_mean"] + w @ mean,
                      (1 - m) ** g * p["running_var"] + w @ unbiased)
        inv = lax.rsqrt(var + eps)                           # (g, C)
        bshape = (1, g) + (1,) * (xg.ndim - 3) + (-1,)
        scale = (p["weight"] * inv).reshape(bshape).astype(x.dtype)
        shift = (p["bias"] - mean * p["weight"] * inv) \
            .reshape(bshape).astype(x.dtype)
        return (x.reshape(xg.shape).astype(x.dtype) * scale
                + shift).reshape(x.shape)
    if ctx is not None and ctx.train:
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes)
        var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
        if ctx.axis_name is not None:
            mean = lax.pmean(mean, ctx.axis_name)
            var = lax.pmean(var, ctx.axis_name)
        n = 1
        for a in axes:
            n *= x.shape[a]
        if ctx.axis_name is not None:
            n *= lax.psum(1, ctx.axis_name)
        unbiased = var * (n / max(n - 1, 1))
        m = ctx.momentum
        ctx.record_bn((1 - m) * p["running_mean"] + m * mean,
                      (1 - m) * p["running_var"] + m * unbiased)
    else:
        mean = p["running_mean"]
        var = p["running_var"]
    inv = lax.rsqrt(var.astype(jnp.float32) + eps)
    scale = (p["weight"] * inv).astype(x.dtype)
    shift = (p["bias"] - mean * p["weight"] * inv).astype(x.dtype)
    return x * scale + shift


def dropout(x, rate: float, ctx: Optional[Ctx]):
    """Torch Dropout2d-style channel dropout is NOT used by the reference in
    its deployed path — ``nn.Dropout2d`` on NCHW zeroes whole channels, which
    is what we replicate (reference models/update.py:17,84)."""
    if ctx is None or not ctx.train or rate <= 0.0:
        return x
    key = ctx.dropout_rng()
    # Dropout2d zeroes entire channels per sample: mask shape (B,1,...,C)
    mask_shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    keep = jax.random.bernoulli(key, 1.0 - rate, mask_shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# Composite layers mirroring the reference wrapper modules
# (/root/reference/models/module.py:32-250).  Each takes the param subtree of
# the matching checkpoint prefix.
# ---------------------------------------------------------------------------

def conv2d_block(x, p: Params, ctx=None, stride=1, padding=0, relu=True, bn=True):
    """Reference `Conv2d` wrapper: conv (+BN) (+ReLU)."""
    y = conv2d(x, p["conv"]["weight"], p["conv"].get("bias"), stride, padding)
    if bn and "bn" in p:
        with scope(ctx, "bn"):
            y = batch_norm(y, p["bn"], ctx)
    if relu:
        y = jax.nn.relu(y)
    return y


def conv3d_block(x, p: Params, ctx=None, stride=1, padding=0, relu=True):
    y = conv3d(x, p["conv"]["weight"], p["conv"].get("bias"), stride, padding)
    if "bn" in p:
        with scope(ctx, "bn"):
            y = batch_norm(y, p["bn"], ctx)
    if relu:
        y = jax.nn.relu(y)
    return y


def deconv3d_block(x, p: Params, ctx=None, stride=1, padding=0,
                   output_padding=0, relu=True):
    y = conv_transpose3d(x, p["conv"]["weight"], p["conv"].get("bias"),
                         stride, padding, output_padding)
    if "bn" in p:
        with scope(ctx, "bn"):
            y = batch_norm(y, p["bn"], ctx)
    if relu:
        y = jax.nn.relu(y)
    return y


def conv_bn_relu2d(x, p: Params, ctx=None, stride=1, padding=1):
    """Reference `ConvBnReLU` (3x3 pad 1 default, no conv bias)."""
    y = conv2d(x, p["conv"]["weight"], None, stride, padding)
    with scope(ctx, "bn"):
        y = batch_norm(y, p["bn"], ctx)
    return jax.nn.relu(y)


# ---------------------------------------------------------------------------
# Torch-default initializers (for training from scratch).
# torch Conv default: kaiming_uniform(a=sqrt(5)) on weight,
# bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
# ---------------------------------------------------------------------------

def _fan_in(shape_kio):
    # (k..., I, O) layout: fan_in = I * prod(k)
    k = 1
    for s in shape_kio[:-2]:
        k *= s
    return k * shape_kio[-2]


def init_conv(key, kshape, use_bias):
    """kshape = (k..., I, O) in our storage layout."""
    import math
    fan_in = _fan_in(kshape)
    gain = math.sqrt(2.0 / (1 + 5.0))  # kaiming_uniform a=sqrt(5)
    bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    p = {"weight": jax.random.uniform(kw, kshape, jnp.float32, -bound, bound)}
    if use_bias:
        bb = 1.0 / math.sqrt(fan_in)
        p["bias"] = jax.random.uniform(kb, (kshape[-1],), jnp.float32, -bb, bb)
    return p


def init_conv_transpose(key, kshape_io, use_bias):
    """kshape_io = (k..., I, O) storage layout; torch fan_in for ConvT is
    computed on its native (I, O, k...) layout => fan_in = O * prod(k)."""
    import math
    k = 1
    for s in kshape_io[:-2]:
        k *= s
    fan_in = k * kshape_io[-1]
    gain = math.sqrt(2.0 / 6.0)
    bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    p = {"weight": jax.random.uniform(kw, kshape_io, jnp.float32, -bound, bound)}
    if use_bias:
        bb = 1.0 / math.sqrt(fan_in)
        p["bias"] = jax.random.uniform(kb, (kshape_io[-1],), jnp.float32, -bb, bb)
    return p


def init_bn(c):
    return {
        "weight": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "running_mean": jnp.zeros((c,), jnp.float32),
        "running_var": jnp.ones((c,), jnp.float32),
    }


def merge_bn_updates(params: Params, updates: Params) -> Params:
    """Return params with BN running stats replaced by collected updates."""
    if not updates:
        return params
    out = dict(params)
    for k, v in updates.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict) \
                and "running_mean" not in v:
            out[k] = merge_bn_updates(out[k], v)
        elif k in out and isinstance(v, dict) and "running_mean" in v:
            node = dict(out[k])
            node.update(v)
            out[k] = node
    return out
