"""Loss parity vs the reference mvs_loss and optimizer schedule shape."""

import numpy as np
import torch
import jax.numpy as jnp

from conftest import load_reference_models
from effi_mvs_plus_tpu.train.loss import mvs_loss, PRED_STAGE_MAP
from effi_mvs_plus_tpu.train.optim import onecycle_linear, trainable_mask


def test_mvs_loss_matches_reference():
    ref = load_reference_models()
    rng = np.random.default_rng(0)
    B = 2
    shapes = {1: (8, 12), 2: (16, 24), 3: (32, 48), 4: (64, 96)}
    gt = {f"stage{k}": rng.uniform(400, 900, (B,) + s).astype(np.float32)
          for k, s in shapes.items()}
    mask = {f"stage{k}": (rng.uniform(0, 1, (B,) + s) > 0.3).astype(np.float32)
            for k, s in shapes.items()}
    preds = [rng.uniform(400, 900, (B,) + shapes[PRED_STAGE_MAP[i]])
             .astype(np.float32) for i in range(13)]

    t_gt = {k: torch.from_numpy(v) for k, v in gt.items()}
    t_mask = {k: torch.from_numpy(v) for k, v in mask.items()}
    t_preds = [torch.from_numpy(p) for p in preds]
    want, want_dict = ref.module.mvs_loss(
        t_preds, t_gt, t_mask, list(PRED_STAGE_MAP), loss_rate=1.0)

    got, got_dict = mvs_loss([jnp.asarray(p) for p in preds],
                             {k: jnp.asarray(v) for k, v in gt.items()},
                             {k: jnp.asarray(v) for k, v in mask.items()})
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for i in range(13):
        np.testing.assert_allclose(float(got_dict[f"l{i}"]),
                                   float(want_dict[f"l{i}"]), rtol=1e-5)


def test_mvs_loss_rate_weighting():
    ref = load_reference_models()
    rng = np.random.default_rng(1)
    B, H, W = 1, 8, 12
    gt = {f"stage{k}": rng.uniform(1, 2, (B, H, W)).astype(np.float32)
          for k in range(1, 5)}
    mask = {k: np.ones((B, H, W), np.float32) for k in gt}
    preds = [rng.uniform(1, 2, (B, H, W)).astype(np.float32)
             for _ in range(4)]
    stage_map = (1, 1, 1, 1)
    want, _ = ref.module.mvs_loss(
        [torch.from_numpy(p) for p in preds],
        {k: torch.from_numpy(v) for k, v in gt.items()},
        {k: torch.from_numpy(v) for k, v in mask.items()},
        list(stage_map), loss_rate=0.9)
    got, _ = mvs_loss([jnp.asarray(p) for p in preds],
                      {k: jnp.asarray(v) for k, v in gt.items()},
                      {k: jnp.asarray(v) for k, v in mask.items()},
                      loss_rate=0.9, stage_map=stage_map)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_onecycle_matches_torch_schedule():
    max_lr, total = 1e-3, 1000
    sched = onecycle_linear(max_lr, total)

    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=max_lr)
    tsched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr, total, pct_start=0.05, cycle_momentum=False,
        anneal_strategy="linear")
    torch_lrs = []
    for _ in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        tsched.step()
    ours = [float(sched(i)) for i in range(total)]
    # same ramp shape within 2% of max_lr everywhere
    np.testing.assert_allclose(ours, torch_lrs, atol=0.02 * max_lr)


def test_trainable_mask_excludes_bn_stats():
    tree = {"feature": {"conv0.0": {"conv": {"weight": 1},
                                    "bn": {"weight": 1, "bias": 1,
                                           "running_mean": 1,
                                           "running_var": 1}}}}
    m = trainable_mask(tree)
    bn = m["feature"]["conv0.0"]["bn"]
    assert bn["weight"] and bn["bias"]
    assert not bn["running_mean"] and not bn["running_var"]
    assert m["feature"]["conv0.0"]["conv"]["weight"]
