"""Full forward with blocked reg/enc/stem conv groups == plain XLA.

All thirteen depth outputs must match the plain path (exactness up to
float reassociation — the blocked convs compute identical taps, see
ops/blocked_conv.py), so deploying any A/B-winning combination cannot
move accuracy.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from effi_mvs_plus_tpu.models import EffiMVSConfig, forward, init_params

import __graft_entry__ as graft


def _run(cfg, params, inputs):
    imgs, proj_ms, dv = inputs
    out = jax.jit(lambda p, i, pr, d: forward(p, i, pr, d, cfg))(
        params, jnp.asarray(imgs),
        {k: jnp.asarray(v) for k, v in proj_ms.items()}, jnp.asarray(dv))
    return out


@pytest.mark.parametrize("impls", [
    {"reg_impl": "blocked"},
    {"enc_impl": "blocked"},
    {"reg_impl": "blocked", "enc_impl": "blocked", "stem_impl": "blocked"},
])
def test_blocked_forward_matches_plain(impls):
    # 64x96 -> stage1 8x12 (D=8 after /4... keep default ndepths 48,8,8:
    # D=48 divisible by 4 and by the 8-fold). Block plans fall back
    # per-conv where spatial sizes don't divide.
    params = init_params(jax.random.PRNGKey(0), EffiMVSConfig())
    inputs = graft._tiny_inputs(batch=1, views=3, height=64, width=96)
    ref = _run(EffiMVSConfig(reg_impl="xla", enc_impl="xla",
                             stem_impl="xla"), params, inputs)
    got = _run(EffiMVSConfig(**impls), params, inputs)
    for a, b in zip(ref["depth"], got["depth"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got["photometric_confidence"]),
        np.asarray(ref["photometric_confidence"]), atol=5e-4, rtol=1e-4)
