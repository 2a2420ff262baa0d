"""Diagnose the PixelwiseNet/3/bias grad-parity gap: noise or semantics?

Computes the full gradient in float64 on BOTH stacks (torch .double(),
jax with x64 enabled).  If the fp64 gradients agree tightly on the leaf
that differs by 2.45% in fp32, the fp32 gap is reduction-order rounding
noise under cancellation, not a semantic (detach/BN) difference.

Run from repo root:  JAX_PLATFORMS=cpu python scripts/diag_grad_fp64.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "tests")
sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import argparse
import numpy as np
import jax.numpy as jnp

from conftest import load_reference_models
from test_model_golden import make_inputs, CKPT, H, W
from test_grad_parity import _gt_pyramid, DLOSSW


def torch_grads64():
    import torch
    # reference module.py:318-319 hardcodes dtype=float32 in the warp grid
    # arange; promote it so the whole graph runs in double
    _arange = torch.arange

    def arange64(*a, **kw):
        if kw.get("dtype") == torch.float32:
            kw["dtype"] = torch.float64
        return _arange(*a, **kw)

    torch.arange = arange64
    ref = load_reference_models()
    imgs, proj_ms, depth_values = make_inputs()
    gt, mask = _gt_pyramid()
    args = argparse.Namespace(ndepths="48,8,8", GRUiters="3,3,3", CostNum=3)
    tmodel = ref.Effi_MVS_plus_cls(args)
    sd = torch.load(CKPT, map_location="cpu", weights_only=False)["model"]
    tmodel.load_state_dict(sd)
    tmodel.train(False)
    tmodel = tmodel.double()
    for m in tmodel.modules():
        if isinstance(m, (torch.nn.Dropout, torch.nn.Dropout2d)):
            m.p = 0.0
    timgs = torch.from_numpy(imgs.transpose(0, 1, 4, 2, 3)).double()
    tprojs = {k: torch.from_numpy(v).double() for k, v in proj_ms.items()}
    out = tmodel(timgs, tprojs, torch.from_numpy(depth_values).double())
    loss, _ = ref.module.mvs_loss(
        out["depth"], {k: torch.from_numpy(v).double() for k, v in gt.items()},
        {k: torch.from_numpy(v).double() for k, v in mask.items()}, DLOSSW,
        loss_rate=1.0)
    loss.backward()
    return float(loss.detach()), {
        n: p.grad.numpy() for n, p in tmodel.named_parameters()
        if p.grad is not None}


def jax_grads64():
    from effi_mvs_plus_tpu.io import load_torch_checkpoint
    from effi_mvs_plus_tpu.models import forward, EffiMVSConfig
    from effi_mvs_plus_tpu.train.loss import mvs_loss

    imgs, proj_ms, depth_values = make_inputs()
    gt, mask = _gt_pyramid()
    params = load_torch_checkpoint(CKPT)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), params)
    cfg = EffiMVSConfig()

    def loss_fn(p):
        out = forward(p, jnp.asarray(imgs, jnp.float64),
                      {k: jnp.asarray(v, jnp.float64)
                       for k, v in proj_ms.items()},
                      jnp.asarray(depth_values, jnp.float64), cfg, None)
        total, _ = mvs_loss(
            out["depth"],
            {k: jnp.asarray(v, jnp.float64) for k, v in gt.items()},
            {k: jnp.asarray(v, jnp.float64) for k, v in mask.items()}, 1.0)
        return total

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    return float(loss), jax.tree.map(np.asarray, grads)


def main():
    from effi_mvs_plus_tpu.io.torch_import import import_state_dict
    tloss, tg = torch_grads64()
    jloss, jg = jax_grads64()
    print(f"loss torch64={tloss:.10f} jax64={jloss:.10f} "
          f"rel={abs(tloss - jloss) / abs(tloss):.2e}")
    tree = import_state_dict(tg)

    def walk(t, pre=()):
        for k, v in t.items():
            if isinstance(v, dict):
                yield from walk(v, pre + (k,))
            else:
                yield pre + (k,), v

    worst = []
    for path, want in walk(tree):
        if path[-1] in ("running_mean", "running_var"):
            continue
        node = jg
        for p in path:
            node = node[p]
        got = np.asarray(node, np.float64)
        want = np.asarray(want, np.float64)
        if np.abs(want).max() == 0:
            continue
        rel = float(np.linalg.norm(got - want) / np.linalg.norm(want))
        worst.append((rel, "/".join(path)))
    worst.sort(reverse=True)
    print("worst fp64 rel-l2 leaves:")
    for r, p in worst[:10]:
        print(f"  {p}: {r:.3e}")


if __name__ == "__main__":
    main()
