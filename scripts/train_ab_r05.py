"""TRAIN_r05.json: training-side kernel A/Bs + the refreshed headline
train-step number at the reference training shape (VERDICT r4 next #3).

Matrix at 640x512, B=4 per chip (the reference trains batch 16 over 4
GPUs = 4/device, train.sh:22-23), 5 views, bf16 compute, full
fwd+bwd+AdamW:
  - reg_impl xla vs blocked   (blocked convs are exact + differentiable;
    inference A/B deployed them, training was gated on this measurement,
    models/effi_mvs.py:129-140)
  - gru_impl xla vs pallas    (fused kernel fwd + custom_vjp XLA bwd —
    blocks.py:352-365 assumed a net loss in training; measure it)
Also measures the 320x256 round-3 shape for continuity with TRAIN_r03.

    timeout 10800 python scripts/train_ab_r05.py > /tmp/train_ab_r05.log 2>&1
"""

import itertools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ART = "/root/repo/TRAIN_r05.json"


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

    import __graft_entry__ as graft
    opt = optax.adamw(1e-3, weight_decay=1e-3)
    results = []

    for (H, W), (reg, gru) in itertools.product(
            ((512, 640), (256, 320)),
            (("xla", "xla"), ("blocked", "xla"), ("xla", "pallas"),
             ("blocked", "pallas"))):
        B, V = 4, 5
        rng = np.random.default_rng(0)
        imgs, pms, dv = graft._tiny_inputs(batch=B, views=V, height=H,
                                           width=W)
        gt, masks = {}, {}
        for s, scale in (("stage1", 8), ("stage2", 4), ("stage3", 2),
                         ("stage4", 1)):
            hh, ww = H // scale, W // scale
            gt[s] = jnp.asarray(
                rng.uniform(450, 900, (B, hh, ww)).astype(np.float32))
            masks[s] = jnp.asarray(
                (rng.uniform(0, 1, (B, hh, ww)) > 0.1).astype(np.float32))

        cfg = EffiMVSConfig(compute_dtype=jnp.bfloat16, reg_impl=reg,
                            gru_impl=gru)
        params = init_params(jax.random.PRNGKey(0), cfg)
        opt_state = opt.init(params)

        def step(params, opt_state, imgs, pm1, pm2, pm3, dv, key,
                 cfg=cfg, gt=gt, masks=masks):
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

        jstep = jax.jit(step, donate_argnums=(0, 1))
        args = (jnp.asarray(imgs), jnp.asarray(pms["stage1"]),
                jnp.asarray(pms["stage2"]), jnp.asarray(pms["stage3"]),
                jnp.asarray(dv))
        key = jax.random.PRNGKey(1)
        row = {"H": H, "W": W, "B": B, "views": V,
               "reg_impl": reg, "gru_impl": gru}
        try:
            t0 = time.perf_counter()
            params, opt_state, loss = jstep(params, opt_state, *args, key)
            fence(loss)
            row["compile_s"] = round(time.perf_counter() - t0, 1)
            iters = 6
            t0 = time.perf_counter()
            for _ in range(iters):
                params, opt_state, loss = jstep(params, opt_state, *args,
                                                key)
            fence(loss)
            dt = (time.perf_counter() - t0) / iters
            row["ms_per_step"] = round(dt * 1e3, 1)
            row["samples_per_s"] = round(B / dt, 2)
            row["loss"] = round(float(jax.device_get(loss)), 3)
        except Exception as e:  # noqa: BLE001 — OOM at the big shape
            row["failed"] = f"{type(e).__name__}: {str(e)[:200]}"
        results.append(row)
        print(row, flush=True)

    with open(ART, "w") as f:
        json.dump({"rows": results,
                   "note": "full fwd+bwd+AdamW, donated params/opt, "
                           "bf16 compute, synthetic batch"}, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
