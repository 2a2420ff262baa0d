"""Fused ConvGRU step as one Pallas TPU kernel (VERDICT r2 #3).

The reference GRU (/root/reference/models/update.py:33-49) runs three 3x3
convs per iteration — convz/convr on cat[h, x], convq on cat[r*h, x] —
with sigmoid/tanh gates and the elementwise combine, each a separate HBM
round-trip under XLA (concat materialisation + conv + epilogue).  This
kernel computes the WHOLE step per image strip in VMEM: h and x are read
once from HBM, the new hidden state is written once.

Layout (the part that makes it a TPU kernel rather than a translation):

* channels-FIRST flattened strips ``(C, rows*Wp)`` with ``Wp`` (padded
  width) a multiple of 128, so that
  - a conv ROW shift is a 128-aligned lane slice (offset dy*Wp),
  - a conv COLUMN shift is a 1-lane slice (the zero pad columns between
    rows double as the conv's zero padding),
  - the three gates live in the matmul M dimension (sublanes) — gate
    extraction is a cheap sublane slice, never a lane slice;
* the z/r/q convs collapse to THREE MXU matmuls per strip (one per dy):
  ``w1[dy] (3hd, 3C1) @ colcat[dy] (3C1, strip_pixels)`` where colcat
  concatenates the three column shifts channel-wise — the q-conv's x-half
  rides in the same matmul with zeros over the h channels (the operand is
  shared, the MXU pass is already paid);
* the q-conv's r*h half is a second 3-matmul pass on the locally-computed
  r*h (r is evaluated with a one-row halo so no neighbour exchange is
  needed);
* strips are double-buffered with manual DMA (grid steps overlap the next
  strip's HBM read with the current matmuls).

Backward: custom_vjp that recomputes through the plain-XLA math — the
kernel is a pure inference-speed play, training takes the XLA path's
gradients unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FG = 128                      # front-guard lanes (zero) before strip data
VMEM_BUDGET = 12 * 1024 * 1024


def _round_up(v, m):
    return -(-v // m) * m


def _gru_xla(h, x, wz, wr, wq, bz, br, bq):
    """Reference math (update.py:40-49), used as fallback and for grads."""
    from effi_mvs_plus_tpu import nn
    hd = h.shape[-1]
    hx = jnp.concatenate([h, x], axis=-1)
    w_zr = jnp.concatenate([wz, wr], axis=-1)
    b_zr = jnp.concatenate([bz, br])
    zr = jax.nn.sigmoid(nn.conv2d(hx, w_zr, b_zr, padding=1))
    z, r = zr[..., :hd], zr[..., hd:]
    rhx = jnp.concatenate([r * h, x], axis=-1)
    q = jnp.tanh(nn.conv2d(rhx, wq, bq, padding=1))
    return (1 - z) * h + z * q


def _vmem_bytes(TH, Wp, C1, hd, esz):
    RWp = (TH + 4) * Wp
    N1 = (TH + 2) * Wp
    N2 = TH * Wp
    return (2 * C1 * _round_up(FG + RWp + 1, 128) * esz          # strips
            + hd * _round_up(FG + N1 + 1, 128) * esz             # rh buf
            + 3 * C1 * (N1 + 2 * Wp) * esz                       # colcat1
            + 3 * hd * (N2 + 2 * Wp) * esz                       # colcat2
            + 3 * hd * N1 * 4                                    # acc1
            + 3 * hd * N2 * 4                                    # acc2+q tmp
            + hd * N1 * 4                                        # h_mid
            + 2 * hd * N2 * esz                                  # out blocks
            + (9 * hd * 3 * C1 + 3 * hd * 3 * hd) * esz)         # weights


def _auto_th(Wp, C1, hd, esz):
    for th in (32, 24, 16, 12, 8, 4):
        if _vmem_bytes(th, Wp, C1, hd, esz) <= VMEM_BUDGET:
            return th
    return None


def _prep_weights(wz, wr, wq, bz, br, bq, hd, C1, dt):
    """HWIO (3,3,Cin,Cout) -> per-dy matmul lhs, dx-major K order."""
    def to_mk(w):                       # (3,3,Cin,M) -> (3, M, 3*Cin)
        return jnp.transpose(w, (0, 3, 1, 2)).reshape(
            3, w.shape[3], 3 * w.shape[2])

    wqx = wq.at[:, :, :hd, :].set(0.0)  # x-half only; h rows ride as zeros
    w1 = jnp.concatenate([to_mk(wz), to_mk(wr), to_mk(wqx)],
                         axis=1).astype(dt)
    w2 = to_mk(wq[:, :, :hd, :]).astype(dt)
    b1 = jnp.concatenate([bz, br, jnp.zeros_like(bz)])[:, None].astype(
        jnp.float32)
    b2 = bq[:, None].astype(jnp.float32)
    return w1, w2, b1, b2


def _kernel(w1_ref, w2_ref, b1_ref, b2_ref, hx_hbm, out_ref,
            strip, rh_buf, cc1_s, cc2_s, sems, *,
            n_strips, n_grid, TH, Wp, C1, hd):
    g = pl.program_id(0)
    RWp = (TH + 4) * Wp
    N1 = (TH + 2) * Wp
    N2 = TH * Wp

    def dma(step, slot):
        return pltpu.make_async_copy(
            hx_hbm.at[step // n_strips, :,
                      pl.ds((step % n_strips) * TH * Wp, RWp)],
            strip.at[slot, :, pl.ds(FG, RWp)],
            sems.at[slot])

    @pl.when(g == 0)
    def _():
        # zero once: guard lanes (front + tail) are never DMA'd over
        strip[...] = jnp.zeros_like(strip)
        rh_buf[...] = jnp.zeros_like(rh_buf)
        dma(0, 0).start()

    @pl.when(g + 1 < n_grid)
    def _():
        dma(g + 1, (g + 1) % 2).start()

    dma(g, g % 2).wait()
    slot = g % 2
    f32 = jnp.float32

    # conv1: z | r | qx over hx, rows [1, TH+3) of the strip.  The column
    # shifts are written into one scratch operand (stores force the
    # relayout; Mosaic cannot concat vectors with differing lane offsets)
    for dx in range(3):
        cc1_s[dx * C1:(dx + 1) * C1, :] = strip[
            slot, :, pl.ds(FG - 1 + dx, N1 + 2 * Wp)]
    acc1 = sum(
        jax.lax.dot(w1_ref[dy], cc1_s[:, dy * Wp:dy * Wp + N1],
                    preferred_element_type=f32)
        for dy in range(3))
    z = jax.nn.sigmoid(acc1[:hd] + b1_ref[:hd])
    r = jax.nn.sigmoid(acc1[hd:2 * hd] + b1_ref[hd:2 * hd])
    qx = acc1[2 * hd:]

    h_mid = strip[slot, 0:hd, pl.ds(FG + Wp, N1)].astype(f32)
    rh_buf[:, pl.ds(FG, N1)] = (r * h_mid).astype(rh_buf.dtype)

    # conv2: q's r*h half, rows [2, TH+2) (the strip interior)
    for dx in range(3):
        cc2_s[dx * hd:(dx + 1) * hd, :] = rh_buf[
            :, pl.ds(FG - 1 + dx, N2 + 2 * Wp)]
    acc2 = sum(
        jax.lax.dot(w2_ref[dy], cc2_s[:, dy * Wp:dy * Wp + N2],
                    preferred_element_type=f32)
        for dy in range(3))
    q = jnp.tanh(acc2 + qx[:, Wp:Wp + N2] + b2_ref[...])

    z_i = z[:, Wp:Wp + N2]
    h_i = h_mid[:, Wp:Wp + N2]
    out_ref[0, 0] = (h_i + z_i * (q - h_i)).astype(out_ref.dtype)


def _fwd_pallas(h, x, wz, wr, wq, bz, br, bq, interpret):
    B, H, W, hd = h.shape
    C1 = hd + x.shape[-1]
    dt = h.dtype
    esz = dt.itemsize if hasattr(dt, "itemsize") else jnp.dtype(dt).itemsize
    Wp = _round_up(W + 2, 128)
    TH = _auto_th(Wp, C1, hd, esz)
    assert TH is not None, "gru_fits() must be checked before dispatch"
    n_strips = -(-H // TH)
    Hp = n_strips * TH + 4

    hx = jnp.concatenate([h, x], axis=-1).transpose(0, 3, 1, 2)
    hx = jnp.pad(hx, ((0, 0), (0, 0), (2, Hp - H - 2), (1, Wp - W - 1)))
    hx = hx.reshape(B, C1, Hp * Wp)
    w1, w2, b1, b2 = _prep_weights(wz, wr, wq, bz, br, bq, hd, C1, dt)

    n_grid = B * n_strips
    RWp = (TH + 4) * Wp
    N1 = (TH + 2) * Wp
    out = pl.pallas_call(
        functools.partial(_kernel, n_strips=n_strips, n_grid=n_grid,
                          TH=TH, Wp=Wp, C1=C1, hd=hd),
        grid=(n_grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),       # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),       # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),       # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),       # b2
            pl.BlockSpec(memory_space=pltpu.ANY),        # hx stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 1, hd, TH * Wp),
            lambda g: (g // n_strips, g % n_strips, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_strips, hd, TH * Wp), dt),
        scratch_shapes=[
            pltpu.VMEM((2, C1, _round_up(FG + RWp + 1, 128)), dt),
            pltpu.VMEM((hd, _round_up(FG + N1 + 1, 128)), dt),
            pltpu.VMEM((3 * C1, N1 + 2 * Wp), dt),
            pltpu.VMEM((3 * hd, TH * Wp + 2 * Wp), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(w1, w2, b1, b2, hx)
    out = out.reshape(B, n_strips, hd, TH, Wp).transpose(0, 1, 3, 4, 2)
    return out.reshape(B, n_strips * TH, Wp, hd)[:, :H, 1:1 + W, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _gru_fused(h, x, wz, wr, wq, bz, br, bq, interpret=False):
    return _fwd_pallas(h, x, wz, wr, wq, bz, br, bq, interpret)


def _gru_fused_fwd(h, x, wz, wr, wq, bz, br, bq, interpret):
    out = _fwd_pallas(h, x, wz, wr, wq, bz, br, bq, interpret)
    return out, (h, x, wz, wr, wq, bz, br, bq)


def _gru_fused_bwd(interpret, res, g):
    _, vjp = jax.vjp(_gru_xla, *res)
    return vjp(g)


_gru_fused.defvjp(_gru_fused_fwd, _gru_fused_bwd)


def gru_fits(h_shape, x_dim, dtype=jnp.bfloat16):
    """True iff the fused kernel supports this shape (VMEM + sublane
    alignment).  Host-side diagnostic mirroring the dispatch test; the
    dtype must match the actual input dtype — _fwd_pallas sizes its VMEM
    scratch with it, so a shape that fits at bf16 may not fit at f32."""
    B, H, W, hd = h_shape
    C1 = hd + x_dim
    if hd % 8 or C1 % 8:
        return False
    esz = jnp.dtype(dtype).itemsize
    return _auto_th(_round_up(W + 2, 128), C1, hd, esz) is not None


def gru_step(h, x, p, impl="auto", interpret=False):
    """ConvGRU step dispatch.  h: (B,H,W,hd); x: (B,H,W,xd);
    p: {'convz'/'convr'/'convq': {'weight' HWIO, 'bias'}}.

    impl: 'auto' (pallas on TPU when the shape fits), 'pallas', 'xla'.
    """
    args = (h, x, p["convz"]["weight"], p["convr"]["weight"],
            p["convq"]["weight"], p["convz"]["bias"], p["convr"]["bias"],
            p["convq"]["bias"])
    if impl == "auto":
        impl = ("pallas" if jax.default_backend() == "tpu"
                and gru_fits(h.shape, x.shape[-1], h.dtype) else "xla")
    if impl == "pallas":
        if not gru_fits(h.shape, x.shape[-1], h.dtype):
            raise ValueError(f"fused GRU unsupported for {h.shape}")
        return _gru_fused(*args, interpret)
    return _gru_xla(*args)
