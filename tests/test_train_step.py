"""Training-step behaviour: loss decreases on a fixed batch, BN running
stats move, masked params (BN stats) are untouched by the optimizer."""

import numpy as np
import jax
import jax.numpy as jnp

from effi_mvs_plus_tpu.models import EffiMVSConfig, init_params
from effi_mvs_plus_tpu.train.optim import make_optimizer
from effi_mvs_plus_tpu.train.trainer import make_train_step, make_eval_step

import __graft_entry__ as graft


def _batch(B=2, H=64, W=96, V=3):
    imgs, proj_ms, dv = graft._tiny_inputs(B, V, H, W)
    rng = np.random.default_rng(3)
    scales = {"stage1": 8, "stage2": 4, "stage3": 2, "stage4": 1}
    gt = {k: rng.uniform(430, 930, (B, H // s, W // s)).astype(np.float32)
          for k, s in scales.items()}
    mask = {k: np.ones_like(v) for k, v in gt.items()}
    return {"imgs": imgs, "proj_matrices": proj_ms, "depth_values": dv,
            "depth": gt, "mask": mask}


def test_train_step_decreases_loss_and_updates_bn():
    cfg = EffiMVSConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt, _ = make_optimizer(1e-3, 100, params=params)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)
    batch = _batch()
    rng = jax.random.PRNGKey(0)

    rm0 = np.asarray(params["feature"]["conv0.0"]["bn"]["running_mean"])
    losses = []
    # 8 steps: the OneCycle warmup makes the first few steps oscillate on
    # random GT; by step 8 the trend must be downward.
    for i in range(8):
        params, opt_state, metrics = step(params, opt_state, batch,
                                          jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    rm1 = np.asarray(params["feature"]["conv0.0"]["bn"]["running_mean"])
    assert np.abs(rm1 - rm0).max() > 0, "BN running stats never updated"
    # running_var must remain positive (weight decay would drag it down)
    rv = np.asarray(params["feature"]["conv0.0"]["bn"]["running_var"])
    assert (rv > 0).all()


def test_eval_step_metrics_shapes():
    cfg = EffiMVSConfig()
    params = init_params(jax.random.PRNGKey(1), cfg)
    batch = _batch()
    m, depth = make_eval_step(cfg)(params, batch)
    assert depth.shape == batch["depth"]["stage4"].shape
    for k, v in m.items():
        assert np.isfinite(float(v)), k
