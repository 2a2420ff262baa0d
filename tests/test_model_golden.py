"""End-to-end forward parity against the reference network with the real
shipped checkpoint (model_dtu.ckpt, 759,100 params) on a small synthetic
scene.  This is the strongest correctness oracle available without the DTU
data: identical inputs through both stacks must agree on all 13 depth maps
and the confidence map.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import load_reference_models

CKPT = "/root/reference/checkpoints/Effi_MVS_plus/model_dtu.ckpt"

H, W, V = 128, 160, 3
DEPTH_MIN, DEPTH_INTERVAL, ND = 425.0, 2.5 * 0.53, 384


def make_inputs(seed=0):
    """Synthetic calibrated views: ref at origin, sources slightly
    translated/rotated, DTU-like depth range."""
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(0, 1, (1, V, H, W, 3)).astype(np.float32)

    intr_q = np.array([[40.0, 0, W / 8], [0, 40.0, H / 8], [0, 0, 1]],
                      np.float32)  # quarter-res (stage2 baseline)
    exts = [np.eye(4, dtype=np.float32)]
    for v in range(1, V):
        E = np.eye(4, dtype=np.float32)
        angle = 0.03 * v
        c, s = np.cos(angle), np.sin(angle)
        E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        E[:3, 3] = np.array([20.0 * v, 5.0 * v, 3.0 * v], np.float32)
        exts.append(E)

    from effi_mvs_plus_tpu.data import cams as camio
    projs = [camio.stage_proj_matrices(E, intr_q) for E in exts]
    proj_ms = {k: np.stack([p[k] for p in projs])[None] for k in projs[0]}
    depth_values = camio.inverse_depth_values(DEPTH_MIN, DEPTH_INTERVAL, ND)[None]
    return imgs, proj_ms, depth_values


@pytest.mark.slow
def test_forward_matches_reference_checkpoint():
    import torch
    import argparse
    ref = load_reference_models()

    imgs, proj_ms, depth_values = make_inputs()

    args = argparse.Namespace(ndepths="48,8,8", GRUiters="3,3,3", CostNum=3)
    tmodel = ref.Effi_MVS_plus_cls(args)
    sd = torch.load(CKPT, map_location="cpu", weights_only=False)["model"]
    tmodel.load_state_dict(sd)
    tmodel.eval()

    timgs = torch.from_numpy(imgs.transpose(0, 1, 4, 2, 3))
    tprojs = {k: torch.from_numpy(v) for k, v in proj_ms.items()}
    with torch.no_grad():
        ref_out = tmodel(timgs, tprojs, torch.from_numpy(depth_values))
    ref_depths = [d.numpy() for d in ref_out["depth"]]
    ref_conf = ref_out["photometric_confidence"].numpy()

    from effi_mvs_plus_tpu.io import load_torch_checkpoint
    from effi_mvs_plus_tpu.models import forward, EffiMVSConfig
    params = load_torch_checkpoint(CKPT)
    out = jax.jit(
        lambda p, i, pr, dv: forward(p, i, pr, dv, EffiMVSConfig())
    )(params, jnp.asarray(imgs),
      {k: jnp.asarray(v) for k, v in proj_ms.items()},
      jnp.asarray(depth_values))

    assert len(out["depth"]) == 13 == len(ref_depths)
    worst = 0.0
    for i, (got, want) in enumerate(zip(out["depth"], ref_depths)):
        got = np.asarray(got)
        assert got.shape == want.shape, f"pred {i}: {got.shape} vs {want.shape}"
        scale = want.max() - want.min() + 1e-6
        err = np.abs(got - want)
        worst = max(worst, float(err.max()))
        # depth values are O(500mm); require sub-0.5% of range agreement
        assert err.max() < 0.005 * scale + 0.5, \
            f"pred {i}: max abs diff {err.max():.4f} (range {scale:.1f})"
    conf = np.asarray(out["photometric_confidence"])
    assert conf.shape == ref_conf.shape
    assert np.abs(conf - ref_conf).max() < 5e-3
    print(f"worst depth abs diff across 13 predictions: {worst:.5f} mm")


@pytest.mark.slow
def test_forward_matches_reference_tank_checkpoint():
    """Same oracle with model_tank.ckpt at the T&T config (ndepths
    96,8,8) — pins the deployed leaderboard path's weight import and
    config plumbing, not just the DTU one."""
    import torch
    import argparse
    ref = load_reference_models()

    imgs, proj_ms, depth_values = make_inputs(seed=1)

    args = argparse.Namespace(ndepths="96,8,8", GRUiters="3,3,3", CostNum=3)
    tmodel = ref.Effi_MVS_plus_cls(args)
    ckpt = "/root/reference/checkpoints/Effi_MVS_plus/model_tank.ckpt"
    sd = torch.load(ckpt, map_location="cpu", weights_only=False)["model"]
    tmodel.load_state_dict(sd)
    tmodel.eval()

    timgs = torch.from_numpy(imgs.transpose(0, 1, 4, 2, 3))
    tprojs = {k: torch.from_numpy(v) for k, v in proj_ms.items()}
    with torch.no_grad():
        ref_out = tmodel(timgs, tprojs, torch.from_numpy(depth_values))
    ref_depths = [d.numpy() for d in ref_out["depth"]]

    from effi_mvs_plus_tpu.io import load_torch_checkpoint
    from effi_mvs_plus_tpu.models import forward, EffiMVSConfig
    params = load_torch_checkpoint(ckpt)
    cfg = EffiMVSConfig(ndepths=(96, 8, 8))
    out = jax.jit(
        lambda p, i, pr, dv: forward(p, i, pr, dv, cfg)
    )(params, jnp.asarray(imgs),
      {k: jnp.asarray(v) for k, v in proj_ms.items()},
      jnp.asarray(depth_values))

    assert len(out["depth"]) == 13 == len(ref_depths)
    for i, (got, want) in enumerate(zip(out["depth"], ref_depths)):
        got = np.asarray(got)
        assert got.shape == want.shape
        scale = want.max() - want.min() + 1e-6
        assert np.abs(got - want).max() < 0.005 * scale + 0.5, \
            f"pred {i}: max abs diff {np.abs(got - want).max():.4f}"
