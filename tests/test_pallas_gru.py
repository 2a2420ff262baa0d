"""Fused ConvGRU Pallas kernel (ops/pallas_gru.py) vs the XLA reference
math — interpret mode on CPU.  Tolerances are f32 summation-order noise:
measured max 3.3e-5 against the XLA conv path, with BOTH impls within
the XLA32-vs-float64 envelope (the kernel is not the outlier)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _inputs(B, H, W, hd, xd, seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.standard_normal((B, H, W, hd)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, H, W, xd)), jnp.float32)
    p = {k: {"weight": jnp.asarray(
                 rng.standard_normal((3, 3, hd + xd, hd)) * 0.1,
                 jnp.float32),
             "bias": jnp.asarray(rng.standard_normal(hd) * 0.1,
                                 jnp.float32)}
         for k in ("convz", "convr", "convq")}
    return h, x, p


# stage channel configs (48/32/16 hidden, update.py dims) incl. one
# multi-strip case (H exceeds the kernel's strip height)
@pytest.mark.parametrize("B,H,W,hd", [(2, 11, 13, 16), (1, 40, 12, 32),
                                      (2, 7, 9, 48)])
def test_fused_gru_parity(B, H, W, hd):
    from effi_mvs_plus_tpu.ops import pallas_gru as pg
    h, x, p = _inputs(B, H, W, hd, hd)
    ref = pg.gru_step(h, x, p, impl="xla")
    got = pg.gru_step(h, x, p, impl="pallas", interpret=True)
    assert ref.shape == got.shape == h.shape
    d = np.abs(np.asarray(ref) - np.asarray(got))
    assert d.max() < 5e-4 and d.mean() < 5e-6, (d.max(), d.mean())


def test_fused_gru_grads_match_xla():
    """custom_vjp routes gradients through the XLA graph — they must be
    bitwise identical to differentiating the XLA path directly."""
    from effi_mvs_plus_tpu.ops import pallas_gru as pg
    h, x, p = _inputs(1, 9, 11, 16, 16)

    # linear loss: the cotangent is primal-independent, so the kernel's
    # XLA-recompute vjp must match differentiating the XLA path exactly
    cot = jnp.asarray(np.random.default_rng(1).standard_normal(h.shape),
                      jnp.float32)

    def loss(fn):
        def f(h, x, wq):
            p2 = {**p, "convq": {**p["convq"], "weight": wq}}
            return jnp.sum(fn(h, x, p2) * cot)
        return f

    f_pal = loss(lambda h, x, p2: pg.gru_step(h, x, p2, impl="pallas",
                                              interpret=True))
    f_xla = loss(lambda h, x, p2: pg.gru_step(h, x, p2, impl="xla"))
    g_pal = jax.grad(f_pal, argnums=(0, 1, 2))(h, x, p["convq"]["weight"])
    g_xla = jax.grad(f_xla, argnums=(0, 1, 2))(h, x, p["convq"]["weight"])
    for a, b in zip(g_pal, g_xla):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_gru_fits_guard():
    from effi_mvs_plus_tpu.ops import pallas_gru as pg
    assert pg.gru_fits((1, 64, 80, 16), 16)
    assert not pg.gru_fits((1, 64, 80, 12), 12)      # hd % 8 != 0
    with pytest.raises(ValueError):
        h, x, p = _inputs(1, 8, 8, 16, 16)
        bad_p = jax.tree.map(lambda a: a, p)
        h12 = h[..., :12]
        pg.gru_step(h12, x, {k: {"weight": v["weight"][:, :, :28, :12],
                                 "bias": v["bias"][:12]}
                             for k, v in bad_p.items()}, impl="pallas",
                    interpret=True)
