"""Legacy metric parity vs the reference models/loss.py (torch, CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import load_reference_models  # noqa: F401

from effi_mvs_plus_tpu.train import metrics as M


@pytest.mark.slow
def test_legacy_metrics_match_reference():
    import torch
    import sys
    load_reference_models()
    from models import loss as ref_loss

    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 900, (2, 24, 32)).astype(np.float32)
    gt[gt < 100] = 0.0                        # some invalid gt
    pred = (gt + rng.normal(0, 20, gt.shape)).astype(np.float32)
    pred[pred < 0] = 0.0
    mask = (rng.uniform(0, 1, gt.shape) > 0.3).astype(np.float32)

    t = lambda x: torch.from_numpy(x)
    ref = ref_loss.compute_errors(t(gt), t(pred), t(mask))
    ours = M.compute_errors(jnp.asarray(gt), jnp.asarray(pred),
                            jnp.asarray(mask))
    names = ["abs_rel", "abs_diff", "sq_rel", "rmse", "rmse_log",
             "a1", "a2", "a3"]
    for name, rv in zip(names, ref):
        np.testing.assert_allclose(float(ours[name]), float(rv),
                                   rtol=2e-4, atol=1e-5), name

    r1 = float(ref_loss.less_one_percentage(t(gt), t(pred), 2.5))
    r3 = float(ref_loss.less_three_percentage(t(gt), t(pred), 2.5))
    o1 = float(M.less_one_percentage(jnp.asarray(gt), jnp.asarray(pred),
                                     2.5))
    o3 = float(M.less_three_percentage(jnp.asarray(gt), jnp.asarray(pred),
                                       2.5))
    np.testing.assert_allclose(o1, r1, rtol=1e-5)
    np.testing.assert_allclose(o3, r3, rtol=1e-5)
