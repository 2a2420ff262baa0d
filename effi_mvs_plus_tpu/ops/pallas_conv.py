"""Fused 3x3 conv(+folded-BN)+ReLU chains as one Pallas TPU kernel.

The FPN stem (/root/reference/models/module.py:353-373) opens with
full-resolution 3->8->8 3x3 convs: tiny channel counts that XLA runs at
~1% of either roof on TPU (measured 95 ms for 11 views at 1920x1056 —
60x off the HBM roofline).  This kernel reuses ops/pallas_gru.py's
layout: channels-first flattened strips with the padded width a multiple
of 128, so a conv row shift is a 128-aligned lane slice, a column shift
is a 1-lane slice (zero pad columns double as conv padding), and the
OUTPUT channels live in the matmul M dimension — an (O, 3I) x (3I, N)
matmul per dy whose M/K pads are harmless because N = strip pixels is
the large dim.  The whole chain runs per strip in VMEM: x is read from
HBM once, the final activation written once.

Inference-only by design: BatchNorm is folded into the weights
(running-stat form), so the dispatcher must only route eval-mode calls
here (training keeps the XLA path and its batch-stat BN).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FG = 128
VMEM_BUDGET = 12 * 1024 * 1024


def _round_up(v, m):
    return -(-v // m) * m


def fold_bn(w_hwio, bn, eps=1e-5, conv_bias=None):
    """Fold eval-mode BN into conv weights: returns (w', b')."""
    g = bn["weight"] / jnp.sqrt(bn["running_var"] + eps)
    w = w_hwio * g[None, None, None, :]
    b = bn["bias"] - bn["running_mean"] * g
    if conv_bias is not None:
        b = b + conv_bias * g
    return w, b


def _vmem_bytes(TH, Wp, chans, esz):
    L = len(chans) - 1
    total = 2 * chans[0] * _round_up(FG + (TH + 2 * L) * Wp + 1, 128) * esz
    for i in range(L):
        Ri = TH + 2 * (L - i - 1)
        Ni = (Ri + 2) * Wp
        total += 3 * chans[i] * (Ri * Wp + 2 * Wp) * esz     # colcat
        total += chans[i + 1] * _round_up(FG + Ri * Wp + 1, 128) * esz
        total += chans[i + 1] * Ni * 4                        # f32 acc
        total += 3 * chans[i + 1] * 3 * chans[i] * esz        # weights
    total += 2 * chans[-1] * TH * Wp * esz                    # out blocks
    return total


def _auto_th(Wp, chans, esz):
    for th in (32, 24, 16, 8):
        if _vmem_bytes(th, Wp, chans, esz) <= VMEM_BUDGET:
            return th
    return None


def _prep_weights(specs, dt):
    """[(w_hwio (3,3,I,O), b (O,))] -> per-dy lhs (3, O, 3I) + (O,1) f32."""
    ws, bs = [], []
    for w, b in specs:
        ws.append(jnp.transpose(w, (0, 3, 1, 2)).reshape(
            3, w.shape[3], 3 * w.shape[2]).astype(dt))
        bs.append(b[:, None].astype(jnp.float32))
    return ws, bs


def _kernel(*refs, L, n_strips, n_grid, TH, Wp, chans, H, W):
    ws = refs[:L]
    bs = refs[L:2 * L]
    hx_hbm = refs[2 * L]
    out_ref = refs[2 * L + 1]
    bufs = refs[2 * L + 2:2 * L + 2 + L]        # stage outputs (scratch)
    ccs = refs[2 * L + 2 + L:2 * L + 2 + 2 * L]
    sems = refs[-1]
    g = pl.program_id(0)
    R = TH + 2 * L
    RWp = R * Wp

    def dma(step, slot):
        return pltpu.make_async_copy(
            hx_hbm.at[step // n_strips, :,
                      pl.ds((step % n_strips) * TH * Wp, RWp)],
            bufs[0].at[slot, :, pl.ds(FG, RWp)],
            sems.at[slot])

    @pl.when(g == 0)
    def _():
        for b in bufs:
            b[...] = jnp.zeros_like(b)
        dma(0, 0).start()

    @pl.when(g + 1 < n_grid)
    def _():
        dma(g + 1, (g + 1) % 2).start()

    dma(g, g % 2).wait()
    f32 = jnp.float32

    cur_slot = g % 2
    for i in range(L):
        Ri = TH + 2 * (L - i - 1)               # rows this stage emits
        Ni = Ri * Wp
        Nin = (Ri + 2) * Wp                     # rows it reads
        src = (bufs[0].at[cur_slot] if i == 0 else bufs[i])
        for dx in range(3):
            ccs[i][dx * chans[i]:(dx + 1) * chans[i], :] = src[
                :, pl.ds(FG - 1 + dx, Nin)]
        acc = sum(
            jax.lax.dot(ws[i][dy], ccs[i][:, dy * Wp:dy * Wp + Ni],
                        preferred_element_type=f32)
            for dy in range(3))
        y = jnp.maximum(acc + bs[i][...], 0.0)
        # zero everything outside the image: a conv's true output only
        # exists for image rows/cols, and the NEXT stage's zero padding
        # must see zeros there — relu(bias) in halo rows / pad columns
        # would otherwise leak into boundary outputs
        s = pl.program_id(0) % n_strips
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, Ni), 1)
        row = s * TH + (i + 1) + lane // Wp     # padded-grid row
        col = lane % Wp
        inside = ((row >= L) & (row < L + H)
                  & (col >= 1) & (col < 1 + W))
        y = jnp.where(inside, y, 0.0)
        if i + 1 < L:
            bufs[i + 1][:, pl.ds(FG, Ni)] = y.astype(bufs[i + 1].dtype)
        else:
            out_ref[0, 0] = y.astype(out_ref.dtype)


def _fwd(x, specs, interpret=False):
    """x: (B, H, W, C0) -> (B, H, W, C_L) through the fused chain."""
    B, H, W, C0 = x.shape
    L = len(specs)
    # DMA needs sublane-aligned channel counts: pad the input (e.g. the
    # RGB stem's 3) to a multiple of 8 with zero channels + zero weight
    # rows — identical math
    C0p = _round_up(C0, 8)
    if C0p != C0:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, C0p - C0)))
        w0, b0 = specs[0]
        w0 = jnp.pad(w0, ((0, 0), (0, 0), (0, C0p - C0), (0, 0)))
        specs = [(w0, b0)] + list(specs[1:])
    chans = [C0p] + [w.shape[3] for w, _ in specs]
    dt = x.dtype
    esz = jnp.dtype(dt).itemsize
    Wp = _round_up(W + 2, 128)
    TH = _auto_th(Wp, chans, esz)
    assert TH is not None, "conv chain exceeds VMEM budget"
    n_strips = -(-H // TH)
    Hp = n_strips * TH + 2 * L

    hx = x.transpose(0, 3, 1, 2)
    hx = jnp.pad(hx, ((0, 0), (0, 0), (L, Hp - H - L), (1, Wp - W - 1)))
    hx = hx.reshape(B, C0p, Hp * Wp)
    ws, bs = _prep_weights(specs, dt)

    n_grid = B * n_strips
    R = TH + 2 * L
    scratch = [pltpu.VMEM((2, C0p, _round_up(FG + R * Wp + 1, 128)), dt)]
    ccs = []
    for i in range(L):
        Ri = TH + 2 * (L - i - 1)
        if i + 1 < L:
            scratch.append(pltpu.VMEM(
                (chans[i + 1], _round_up(FG + Ri * Wp + 1, 128)), dt))
        ccs.append(pltpu.VMEM((3 * chans[i], (Ri + 2) * Wp), dt))
    # bufs list in-kernel: [input(2-slot), stage1_out, ..] then ccs
    out = pl.pallas_call(
        functools.partial(_kernel, L=L, n_strips=n_strips, n_grid=n_grid,
                          TH=TH, Wp=Wp, chans=chans, H=H, W=W),
        grid=(n_grid,),
        in_specs=([pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * L)
                  + [pl.BlockSpec(memory_space=pltpu.ANY)]),
        out_specs=pl.BlockSpec(
            (1, 1, chans[-1], TH * Wp),
            lambda g: (g // n_strips, g % n_strips, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_strips, chans[-1], TH * Wp), dt),
        scratch_shapes=scratch + ccs + [pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(*ws, *bs, hx)
    out = out.reshape(B, n_strips, chans[-1], TH, Wp)
    out = out.transpose(0, 1, 3, 4, 2).reshape(
        B, n_strips * TH, Wp, chans[-1])
    return out[:, :H, 1:1 + W, :]


def chain_fits(x_shape, specs_chans, dtype=jnp.bfloat16):
    """True iff the fused chain supports this shape (VMEM + sublanes).
    dtype must match the input's — _fwd sizes scratch with it, so a
    shape that fits at bf16 may not fit at f32."""
    B, H, W, C0 = x_shape
    chans = [_round_up(C0, 8)] + list(specs_chans)
    if any(c % 8 for c in chans[1:]):
        return False
    esz = jnp.dtype(dtype).itemsize
    return _auto_th(_round_up(W + 2, 128), chans, esz) is not None


def conv_bn_relu_chain(x, specs, interpret=False):
    """Fused chain of 3x3 stride-1 conv(+folded scale/bias)+ReLU stages.

    x: (B, H, W, C0); specs: [(w_hwio (3,3,Ci,Co), bias (Co,)), ...] with
    BN already folded (see fold_bn).  Exact same math as the XLA
    conv+bias+relu chain, evaluated strip-wise in VMEM.
    """
    return _fwd(x, specs, interpret)
