"""Train-step A/B: blocked cost-reg/CSP convs under the FULL fwd+bwd.

    timeout 5400 python scripts/ab_blocked_train.py > /tmp/ab_blocked_train.log 2>&1

The inference A/B (AB_BLOCKED_r04.json) deployed blocked reg convs at
inference only; this measures the training step (round-3 reference
shape: 320x256 crops, B=4, 5 views, bf16 compute, full loss + AdamW)
with reg_impl forced 'blocked' vs 'xla'.  Blocked convs are exact in
train mode (same BN batch stats — tests/test_blocked_feature_net.py)
and differentiable (the VJP is blocked convs again), so a win here is
deployable by extending the 'auto' rule to training.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax
    from effi_mvs_plus_tpu.models import EffiMVSConfig, forward, init_params
    from effi_mvs_plus_tpu.train.loss import mvs_loss
    from effi_mvs_plus_tpu import nn

    def fence(x):
        return float(jax.device_get(jnp.ravel(x)[0]))

    fence(jnp.zeros(1))
    print("tunnel up", flush=True)

    B, V, H, W = 4, 5, 256, 320
    rng = np.random.default_rng(0)
    import __graft_entry__ as graft
    imgs, pms, dv = graft._tiny_inputs(batch=B, views=V, height=H, width=W)
    gt = {}
    masks = {}
    for s, scale in (("stage1", 8), ("stage2", 4), ("stage3", 2),
                     ("stage4", 1)):
        hh, ww = H // scale, W // scale
        gt[s] = jnp.asarray(
            rng.uniform(450, 900, (B, hh, ww)).astype(np.float32))
        masks[s] = jnp.asarray(
            (rng.uniform(0, 1, (B, hh, ww)) > 0.1).astype(np.float32))

    opt = optax.adamw(1e-3, weight_decay=1e-3)

    for impl in ("xla", "blocked"):
        cfg = EffiMVSConfig(compute_dtype=jnp.bfloat16, reg_impl=impl)
        params = init_params(jax.random.PRNGKey(0), cfg)
        opt_state = opt.init(params)

        def step(params, opt_state, imgs, pm1, pm2, pm3, dv, key):
            def loss_fn(p):
                ctx = nn.Ctx(train=True, rng=key)
                out = forward(p, imgs, {"stage1": pm1, "stage2": pm2,
                                        "stage3": pm3}, dv, cfg, ctx=ctx)
                total, _per = mvs_loss(out["depth"], gt, masks)
                return total, ctx.updates
            (loss, _upd), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        jstep = jax.jit(step)
        args = (jnp.asarray(imgs), jnp.asarray(pms["stage1"]),
                jnp.asarray(pms["stage2"]), jnp.asarray(pms["stage3"]),
                jnp.asarray(dv))
        key = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        params, opt_state, loss = jstep(params, opt_state, *args, key)
        fence(loss)
        compile_s = time.perf_counter() - t0
        iters = 6
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = jstep(params, opt_state, *args, key)
        fence(loss)
        dt = (time.perf_counter() - t0) / iters
        print({"impl": impl, "ms_per_step": round(dt * 1e3, 1),
               "compile_s": round(compile_s, 1),
               "loss": round(float(jax.device_get(loss)), 3)}, flush=True)


if __name__ == "__main__":
    main()
