"""Space-to-depth BLOCKED convolutions: full-lane MXU shapes for the
model's tiny-channel conv stack.

Why: the reference network (and therefore this one) runs almost all of
its 2-D/3-D convs at 1-32 channels (/root/reference/models/module.py:
346-412 FeatureNet levels at 8/16/32, update.py:10-38 encoder convs at
1-48 in, module.py:435-516 cost/CSP 3-D convs at 1-32).  On TPU a conv
is an implicit matmul whose output width is C_out: at C_out<=16 fewer
than 13% of the MXU's 128 lanes do work, and the round-4 T&T trace
measured the conv stack at 0.1-11 TF/s (~165 ms of a 378 ms forward).

The fix is algebraic, not a new kernel: fold a (bh, bw) pixel block into
the channel axis (space-to-depth) and transform the weight so that ONE
stride-1 conv over the blocked layout computes the EXACT same map.  The
blocked conv does prod(block) x the FLOPs (the transformed weight is
block-sparse and the MXU does not skip zeros) but runs at full-lane MXU
rates — measured on v5e (scripts/probe_blocked_conv.py): the deployed
[11,528,960,16] 3x3 conv drops 16.8 -> 4.7 ms at (2,4) blocking.

Derivation (1-D, per axis; all indices 0-based):
  forward conv        y[r] = sum_u x[s*r + u - p] w[u]
  blocked:  y_b[i,d] := y[ob*i + d],  x_b[j,q] := x[ib*j + q],  ib = s*ob
     s*(ob*i + d) + u - p = ib*(i + dt) + q
     =>  u = ib*dt + q - s*d + p                            (forward)
  transpose conv      y[r] = sum_u xd[r + u - pe] w[u],  pe = k-1-p,
  xd the s-dilated input (xd[s*m] = x[m], else 0), w pre-flipped
  (io/torch_import.py).  With input block ibs and ob = s*ibs:
     s*(ibs*(i + dt) + q) = ob*i + d + u - pe
     =>  u = ib*dt + s*q - d + pe                           (transpose)
  Each (dt, q, d) with u in [0, k) contributes w[u] to the blocked
  weight w_b[dt+T, (q,c), (d,o)]; the blocked conv is then stride-1 with
  left pad T = -min(dt) and right pad chosen so the blocked output
  covers the torch output size (out-of-range taps read zero padding,
  which matches torch semantics exactly — see _pad_right).

Axes transform independently; 2-D/3-D forms are outer products of the
1-D rule.  Folding a FULL short axis (the D=8 volume axis of the
CSP/cost convs) is the degenerate case ob = D: the 3-D conv becomes
2-D with D folded into channels (D/kd x FLOPs, full lanes).

Everything is traced jax; the weight transform is a static scatter of
the original weight (weights are KBs) so checkpoints stay in their
reference layout.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax.numpy as jnp
from jax import lax


def _axis_taps(k: int, s: int, p_eff: int, ib: int, ob: int, qm: int,
               dm: int, nq: int):
    """1-D tap enumeration: u = ib*dt + qm*q - dm*d + p_eff for q in
    [0, nq), d in [0, ob), u in [0, k).  Returns (KB, T, taps) with taps
    as (dt+T, q, d, u)."""
    taps = []
    tmin = tmax = 0
    span = max(k // max(ib, 1), 1) + 2
    for d in range(ob):
        for q in range(nq):
            for dt in range(-span, span + 1):
                u = ib * dt + qm * q - dm * d + p_eff
                if 0 <= u < k:
                    taps.append((dt, q, d, u))
                    tmin = min(tmin, dt)
                    tmax = max(tmax, dt)
    T = -tmin
    return tmax - tmin + 1, T, [(dt + T, q, d, u) for dt, q, d, u in taps]


@functools.lru_cache(maxsize=None)
def _block_maps(k: Tuple[int, ...], s: Tuple[int, ...], p: Tuple[int, ...],
                ob: Tuple[int, ...], transpose: bool):
    """Static scatter maps for the N-D blocked weight.  Returns
    (ib, nq, KB, T, idx) where idx = (t, q, d, u) flat numpy arrays."""
    nd = len(k)
    plans = []
    ib = []
    nq = []
    for a in range(nd):
        if transpose:
            # ob[a] is the OUTPUT block; input block ibs = ob/s
            assert ob[a] % s[a] == 0
            ibs = ob[a] // s[a]
            pe = k[a] - 1 - p[a]
            plans.append(_axis_taps(k[a], s[a], pe, ob[a], ob[a],
                                    qm=s[a], dm=1, nq=ibs))
            ib.append(ibs)
            nq.append(ibs)
        else:
            ibf = s[a] * ob[a]
            plans.append(_axis_taps(k[a], s[a], p[a], ibf, ob[a],
                                    qm=1, dm=s[a], nq=ibf))
            ib.append(ibf)
            nq.append(ibf)
    KB = tuple(pl[0] for pl in plans)
    T = tuple(pl[1] for pl in plans)

    src, dst_t, dst_q, dst_d = [], [], [], []

    def rec(a, t_acc, q_acc, d_acc, u_acc):
        if a == nd:
            def flat(idx, dims):
                out = 0
                for i, dim in zip(idx, dims):
                    out = out * dim + i
                return out
            dst_t.append(flat(t_acc, KB))
            dst_q.append(flat(q_acc, nq))
            dst_d.append(flat(d_acc, ob))
            src.append(flat(u_acc, k))
            return
        for (t, q, d, u) in plans[a][2]:
            rec(a + 1, t_acc + [t], q_acc + [q], d_acc + [d], u_acc + [u])

    rec(0, [], [], [], [])
    idx = (np.asarray(dst_t, np.int64), np.asarray(dst_q, np.int64),
           np.asarray(dst_d, np.int64), np.asarray(src, np.int64))
    return tuple(ib), tuple(nq), KB, T, idx


def block_weight(w, stride, padding, out_block, transpose=False):
    """Transform a torch-layout conv weight (k..., I, O) into its blocked
    equivalent (KB..., prod(ib)*I, prod(ob)*O).  Traced (jnp) — the
    scatter indices are static and the tensors are KBs."""
    *ks, I, O = w.shape
    nd = len(ks)
    stride = _t(stride, nd)
    padding = _t(padding, nd)
    out_block = _t(out_block, nd)
    ib, nq, KB, T, (t_i, q_i, d_i, u_i) = _block_maps(
        tuple(ks), stride, padding, out_block, transpose)
    wf = w.reshape(int(np.prod(ks)), I, O)
    wb = jnp.zeros((int(np.prod(KB)), int(np.prod(nq)), I,
                    int(np.prod(out_block)), O), w.dtype)
    wb = wb.at[t_i, q_i, :, d_i, :].set(wf[u_i])
    Qin = int(np.prod(nq)) * I
    Qout = int(np.prod(out_block)) * O
    return wb.reshape(KB + (Qin, Qout)), ib, KB, T


def _t(v, n):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * n


def space_to_depth(x, block):
    """(B, S..., C) -> (B, S/b..., prod(b)*C).  Pads spatial dims with
    zeros up to block multiples (exact: padded taps read zero either
    way — see module docstring)."""
    B = x.shape[0]
    S = x.shape[1:-1]
    C = x.shape[-1]
    nd = len(S)
    block = _t(block, nd)
    pads = [(0, 0)]
    padded = False
    for s, b in zip(S, block):
        r = (-s) % b
        pads.append((0, r))
        padded |= r > 0
    pads.append((0, 0))
    if padded:
        x = jnp.pad(x, pads)
    S = x.shape[1:-1]
    shape = [B]
    for s, b in zip(S, block):
        shape += [s // b, b]
    shape.append(C)
    x = x.reshape(shape)
    perm = [0] + [1 + 2 * a for a in range(nd)] + \
        [2 + 2 * a for a in range(nd)] + [1 + 2 * nd]
    x = x.transpose(perm)
    return x.reshape((B,) + tuple(s // b for s, b in zip(S, block))
                     + (int(np.prod(block)) * C,))


def depth_to_space(x, block, C, crop=None):
    """Inverse of space_to_depth; crops to `crop` spatial sizes."""
    B = x.shape[0]
    Sb = x.shape[1:-1]
    nd = len(Sb)
    block = _t(block, nd)
    x = x.reshape((B,) + tuple(Sb) + tuple(block) + (C,))
    perm = [0]
    for a in range(nd):
        perm += [1 + a, 1 + nd + a]
    perm.append(1 + 2 * nd)
    x = x.transpose(perm)
    x = x.reshape((B,) + tuple(s * b for s, b in zip(Sb, block)) + (C,))
    if crop is not None:
        sl = (slice(None),) + tuple(slice(0, c) for c in crop) \
            + (slice(None),)
        x = x[sl]
    return x


_DIMNUMS = {1: ("NHC", "HIO", "NHC"),
            2: ("NHWC", "HWIO", "NHWC"),
            3: ("NDHWC", "DHWIO", "NDHWC")}


def _out_sizes(S, k, s, p, transpose, output_padding):
    if transpose:
        return tuple((S[a] - 1) * s[a] - 2 * p[a] + k[a] + output_padding[a]
                     for a in range(len(S)))
    return tuple((S[a] + 2 * p[a] - k[a]) // s[a] + 1 for a in range(len(S)))


def blocked_conv_raw(x_b, w, stride, padding, out_block, n_in_blocks,
                     out_sizes, transpose=False):
    """Conv over an ALREADY-BLOCKED input; returns the BLOCKED output.

    x_b: (B, Sb..., prod(ib)*I) with ib = stride*out_block (forward) or
    out_block/stride (transpose); w: original torch-layout weight.
    n_in_blocks: x_b's spatial block counts; out_sizes: the torch output
    pixel sizes (for right-padding the block grid) — for transpose convs
    any output_padding must already be folded into out_sizes by the
    caller (conv_blocked does; ADVICE r4 #3 made the contract explicit by
    dropping the formerly-unused output_padding parameter).
    """
    nd = w.ndim - 2
    stride = _t(stride, nd)
    padding = _t(padding, nd)
    out_block = _t(out_block, nd)
    wb, ib, KB, T = block_weight(w, stride, padding, out_block, transpose)
    # blocks needed to cover the torch output; right-pad the conv so the
    # block grid reaches them (extra taps read zeros = torch semantics)
    # out_blocks(Tl, Tr) = n + Tl + Tr - (KB-1); with Tl = T choose Tr so
    # the grid covers exactly ceil(out_size / ob) blocks.  NOTE for
    # chains (blocked intermediate consumed by another blocked conv):
    # when ob divides out_size this is exact; otherwise the last block's
    # tail holds out-of-image values and MUST be cropped (depth_to_space
    # crop=) before further convs tap it.
    pads = []
    slices = [slice(None)] * nd
    for a in range(nd):
        need = -(-out_sizes[a] // out_block[a])
        have = n_in_blocks[a] + T[a] - (KB[a] - 1)
        if need == 1 and n_in_blocks[a] == 1:
            # Full-axis fold (e.g. the D=8 volume axis): every tap with
            # dt != 0 reads zero padding only — slice them off so the
            # blocked kernel is 1 wide on this axis (b/k x FLOPs, not
            # prod(KB)*b/k x).
            slices[a] = slice(T[a], T[a] + 1)
            pads.append((0, 0))
        else:
            pads.append((T[a], max(0, need - have)))
    wb = wb[tuple(slices)]
    return lax.conv_general_dilated(
        x_b, wb.astype(x_b.dtype), window_strides=(1,) * nd,
        padding=pads, dimension_numbers=_DIMNUMS[nd])


def conv_blocked(x, w, b=None, stride=1, padding=0, out_block=1,
                 transpose=False, output_padding=0):
    """Drop-in torch-semantics conv (2-D or 3-D, forward or transpose)
    via the blocked path.  x: (B, S..., I) unblocked; blocks/unblocks
    internally — for chains use space_to_depth once + blocked_conv_raw
    per layer.  Any spatial size (zero-pads to block multiples)."""
    nd = w.ndim - 2
    stride = _t(stride, nd)
    padding = _t(padding, nd)
    out_block = _t(out_block, nd)
    output_padding = _t(output_padding, nd)
    S = x.shape[1:-1]
    out_sizes = _out_sizes(S, w.shape[:nd], stride, padding, transpose,
                           output_padding)
    ib = tuple(o // s for o, s in zip(out_block, stride)) if transpose \
        else tuple(o * s for o, s in zip(out_block, stride))
    x_b = space_to_depth(x, ib)
    y_b = blocked_conv_raw(x_b, w, stride, padding, out_block,
                           x_b.shape[1:-1], out_sizes, transpose)
    y = depth_to_space(y_b, out_block, w.shape[-1], crop=out_sizes)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def bn_blocked(y_b, p, ctx, block, eps: float = 1e-5):
    """BatchNorm on a blocked activation, exact per-REAL-channel stats.

    y_b: (B, Sb..., prod(block)*C).  Reshapes the channel axis to
    (prod(block), C) so nn.batch_norm reduces over block positions too —
    bit-for-bit the same statistics as the unblocked layout, in both
    train and eval modes (stat_groups included)."""
    from effi_mvs_plus_tpu import nn
    P = int(np.prod(_t(block, len(y_b.shape) - 2)))
    C = y_b.shape[-1] // P
    y = y_b.reshape(y_b.shape[:-1] + (P, C))
    y = nn.batch_norm(y, p, ctx, eps=eps)
    return y.reshape(y_b.shape)
