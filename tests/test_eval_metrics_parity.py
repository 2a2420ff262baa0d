"""Eval-metric parity vs the reference's Thres_metrics /
AbsDepthError_metrics (/root/reference/utils.py:139-160) and the exact
``test_sample_depth`` scalar suite (/root/reference/train.py:293-338).

These numbers are the day-to-day training-parity signal, so their
definitions (per-image means, fixed absolute thresholds, banded abs
errors) must match the reference bit-for-bit in semantics.
"""

import sys
import types

import numpy as np
import jax.numpy as jnp

from conftest import REFERENCE_DIR

from effi_mvs_plus_tpu.train.loss import abs_depth_error, threshold_error


def _load_reference_utils():
    # other tests (conftest, test_data_io) may have stubbed `torchvision`
    # WITHOUT the utils submodule — always ensure both entries exist, else
    # `import torchvision.utils` inside reference utils.py fails with
    # "'torchvision' is not a package"
    tv = sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    if "torchvision.utils" not in sys.modules:
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision.utils"] = tvu
    # the conftest may have stubbed `utils` for the models import; force the
    # real reference module under a private name
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "_ref_utils", REFERENCE_DIR + "/utils.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _batch(seed=0, B=3, H=24, W=32):
    rng = np.random.default_rng(seed)
    gt = rng.uniform(400, 900, (B, H, W)).astype(np.float32)
    pred = (gt + rng.normal(0, 6, gt.shape)).astype(np.float32)
    # sprinkle a few large errors so every band is populated
    idx = rng.integers(0, H * W, 40)
    flat = pred.reshape(B, -1)
    flat[:, idx[:20]] += rng.uniform(2, 25, (B, 20)).astype(np.float32)
    flat[:, idx[20:]] -= rng.uniform(8, 40, (B, 20)).astype(np.float32)
    mask = (rng.uniform(0, 1, gt.shape) > 0.3).astype(np.float32)
    return pred, gt, mask


def test_threshold_and_banded_metrics_match_reference():
    import torch
    ref = _load_reference_utils()
    pred, gt, mask = _batch()
    t = lambda x: torch.from_numpy(x)
    jp, jg, jm = map(jnp.asarray, (pred, gt, mask))

    # the exact (name, threshold) set of train.py:325-331
    for thres in (0.125, 0.25, 0.5, 1.0, 20.0):
        r = float(ref.Thres_metrics(t(pred), t(gt), t(mask) > 0.5, thres))
        o = float(threshold_error(jp, jg, jm, thres))
        np.testing.assert_allclose(o, r, rtol=1e-5, atol=1e-6)

    r = float(ref.AbsDepthError_metrics(t(pred), t(gt), t(mask) > 0.5))
    o = float(abs_depth_error(jp, jg, jm))
    np.testing.assert_allclose(o, r, rtol=1e-5, atol=1e-5)

    # the six bands of train.py:332-338
    for band in ([0, 2.0], [2.0, 4.0], [4.0, 8.0], [8.0, 14.0],
                 [14.0, 20.0], [20.0, 1e5]):
        r = float(ref.AbsDepthError_metrics(t(pred), t(gt), t(mask) > 0.5,
                                            band))
        o = float(abs_depth_error(jp, jg, jm, tuple(band)))
        np.testing.assert_allclose(o, r, rtol=1e-5, atol=1e-5), band


def test_banded_metric_empty_band_is_zero():
    """Reference returns 0 when a band selects no pixels
    (utils.py:156-158)."""
    pred = jnp.full((1, 8, 8), 500.0)
    gt = jnp.full((1, 8, 8), 500.5)      # all errors = 0.5
    mask = jnp.ones((1, 8, 8))
    assert float(abs_depth_error(pred, gt, mask, (14.0, 20.0))) == 0.0


def test_eval_step_emits_reference_key_suite():
    """make_eval_step's scalar dict carries exactly the reference's keys
    (train.py:320-341): loss, depth_loss, abs error, 5 thresholds, 6
    bands, l0..l12."""
    from effi_mvs_plus_tpu.train.trainer import make_eval_step
    from effi_mvs_plus_tpu.models import EffiMVSConfig, init_params
    import jax
    import __graft_entry__ as graft

    cfg = EffiMVSConfig()
    params = init_params(jax.random.PRNGKey(0))
    B, H, W, V = 2, 64, 96, 3
    imgs, proj_ms, dv = graft._tiny_inputs(B, V, H, W)
    nprng = np.random.default_rng(3)
    scales = {"stage1": 8, "stage2": 4, "stage3": 2, "stage4": 1}
    gt = {k: nprng.uniform(430, 930, (B, H // s, W // s)).astype(np.float32)
          for k, s in scales.items()}
    batch = {"imgs": imgs, "proj_matrices": proj_ms, "depth_values": dv,
             "depth": gt, "mask": {k: np.ones_like(v) for k, v in gt.items()}}
    m, depth = make_eval_step(cfg)(params, batch)

    expect = {"loss", "depth_loss", "abs_depth_error",
              "thres2mm_error", "thres4mm_error", "thres8mm_error",
              "thres14mm_error", "thres20mm_error",
              "thres2mm_abserror", "thres4mm_abserror", "thres8mm_abserror",
              "thres14mm_abserror", "thres20mm_abserror",
              "thres>20mm_abserror"} | {f"l{i}" for i in range(13)}
    assert set(m) == expect, set(m) ^ expect
    assert np.isfinite(float(m["loss"]))
    # depth_loss is the LAST prediction's loss (train.py:255, iters=12)
    np.testing.assert_allclose(float(m["depth_loss"]), float(m["l12"]))
