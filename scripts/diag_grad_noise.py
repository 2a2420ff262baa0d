"""Is the 2.45% fp32 grad gap on PixelwiseNet/3/bias rounding noise?

Ground truth = the reference itself in float64.  Compare the reference's
OWN float32 gradients against its float64 gradients: if torch-fp32
deviates from torch-fp64 by the same order as jax-fp32 deviates from
torch-fp32, the gap is reduction-order rounding under cancellation, not
a semantic difference in our model.

Run:  JAX_PLATFORMS=cpu python scripts/diag_grad_noise.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "tests")
sys.path.insert(0, ".")

import argparse
import numpy as np

from conftest import load_reference_models
from test_model_golden import make_inputs, CKPT
from test_grad_parity import _gt_pyramid, DLOSSW


def torch_grads(double: bool):
    import torch
    if double:
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
    if double:
        tmodel = tmodel.double()
    for m in tmodel.modules():
        if isinstance(m, (torch.nn.Dropout, torch.nn.Dropout2d)):
            m.p = 0.0

    def t(x):
        v = torch.from_numpy(x)
        return v.double() if double else v

    timgs = t(imgs.transpose(0, 1, 4, 2, 3))
    tprojs = {k: t(v) for k, v in proj_ms.items()}
    out = tmodel(timgs, tprojs, t(depth_values))
    loss, _ = ref.module.mvs_loss(
        out["depth"], {k: t(v) for k, v in gt.items()},
        {k: t(v) for k, v in mask.items()}, DLOSSW, loss_rate=1.0)
    loss.backward()
    if double:
        torch.arange = _arange
    return {n: p.grad.numpy().astype(np.float64)
            for n, p in tmodel.named_parameters() if p.grad is not None}


def main():
    g64 = torch_grads(True)
    g32 = torch_grads(False)
    rows = []
    for n in g64:
        a, b = g32[n], g64[n]
        s = np.linalg.norm(b)
        if s == 0:
            continue
        rows.append((float(np.linalg.norm(a - b) / s), n))
    rows.sort(reverse=True)
    print("torch-fp32 vs torch-fp64 worst rel-l2 leaves (self-noise):")
    for r, n in rows[:12]:
        print(f"  {n}: {r:.3e}")
    for n in g64:
        if "Pixel" in n and n.endswith("bias") and g64[n].size == 1:
            print(f"{n}: fp64={g64[n]} fp32={g32[n]} "
                  f"rel={abs(g32[n] - g64[n]).max() / abs(g64[n]).max():.3e}")


if __name__ == "__main__":
    main()
