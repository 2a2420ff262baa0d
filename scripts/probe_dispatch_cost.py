"""How much does the warp ladder's DISPATCH cost at the T&T point?

    timeout 3600 python scripts/probe_dispatch_cost.py > /tmp/probe_dispatch.log 2>&1

The forward ladder computes two traced predicates and a 5-way
lax.switch whose branches close over the projection fields (~120-160 MB
per stage at 1056x1920) — the round-4 trace shows ~120 ms of flattened
async-copy busy time per step.  This times the full tank forward with
FORCE_RUNG (trace-time override, no predicates/switch) against the
deployed ladder; the delta is the dispatch overhead: predicate compute
+ switch operand/result copies.

NOTE scene content takes rung 0 at every stage (verified by the ladder
fix in commit 74ca544), so FORCE_RUNG=0 computes the same numbers.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import tank_scene_rig as rig  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.io import load_torch_checkpoint
    from effi_mvs_plus_tpu.models import EffiMVSConfig, forward
    from effi_mvs_plus_tpu.ops import pallas_warp as pw

    params = load_torch_checkpoint(
        "/root/reference/checkpoints/Effi_MVS_plus/model_tank.ckpt")
    cfg = EffiMVSConfig(ndepths=rig.NDEPTHS, compute_dtype=jnp.bfloat16,
                        reg_impl="blocked")

    def fence(x):
        return float(jax.device_get(jnp.ravel(x)[0]))

    fence(jnp.zeros(1))
    print("tunnel up", flush=True)

    B = 1
    imgs, pm, dv = rig.batch(B)
    args = (jnp.asarray(imgs), jnp.asarray(pm["stage1"]),
            jnp.asarray(pm["stage2"]), jnp.asarray(pm["stage3"]),
            jnp.asarray(dv))

    # (force_rung, recompute_fields) variants, interleaved twice to kill
    # order bias; reg_impl pinned 'blocked' so 'auto' ambiguity is out.
    variants = [("ladder-pass", None, False), ("ladder-rec", None, True),
                ("rung0", 0, False), ("pred0", "pred0", False)]
    fns = {}
    for name, force, rec in variants:
        pw.FORCE_RUNG = force
        pw.DISPATCH_RECOMPUTE_FIELDS = rec
        fns[name] = jax.jit(lambda i, s1, s2, s3, d, _v=name: forward(
            params, i, {"stage1": s1, "stage2": s2, "stage3": s3}, d,
            cfg, ctx=None)["depth"][-1])
        y = fns[name](*args)   # compile under the right module flags
        fence(y)
        print(f"compiled {name}, median "
              f"{float(np.median(np.asarray(y, np.float32))):.4f}",
              flush=True)
    pw.FORCE_RUNG = None
    for rnd in range(2):
        for name, _f, _r in variants:
            t0 = time.perf_counter()
            iters = 6
            y = None
            for _ in range(iters):
                y = fns[name](*args)
            fence(y)
            dt = (time.perf_counter() - t0) / iters / B
            print({"round": rnd, "variant": name,
                   "s_per_map": round(dt, 4)}, flush=True)


if __name__ == "__main__":
    main()
