"""One-iteration xplane trace of the T&T forward at B=2 on the current
tree (cache-warm: reuses the tank_r5_sweep executable).  Feeds
scripts/xplane_selftime.py — closes VERDICT r4 weak #5 (is the warp
still the top segment after the round-5 anchor + tiled-dispatch work?).

    timeout 3600 python scripts/tank_r5_trace.py > /tmp/tank_r5_trace.log 2>&1
"""

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import tank_scene_rig as rig  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.io import load_torch_checkpoint
    from effi_mvs_plus_tpu.models import EffiMVSConfig, forward

    params = load_torch_checkpoint(
        "/root/reference/checkpoints/Effi_MVS_plus/model_tank.ckpt")
    cfg = EffiMVSConfig(ndepths=rig.NDEPTHS, compute_dtype=jnp.bfloat16)

    def fence(x):
        return float(jax.device_get(jnp.ravel(x)[0]))

    fence(jnp.zeros(1))
    fjit = jax.jit(lambda i, s1, s2, s3, d: forward(
        params, i, {"stage1": s1, "stage2": s2, "stage3": s3}, d,
        cfg, ctx=None)["depth"][-1])
    imgs, pm, dv = rig.batch(2)
    args = (jnp.asarray(imgs), jnp.asarray(pm["stage1"]),
            jnp.asarray(pm["stage2"]), jnp.asarray(pm["stage3"]),
            jnp.asarray(dv))
    fence(fjit(*args))
    os.system("rm -rf /tmp/tank_xprof_r5b")
    with jax.profiler.trace("/tmp/tank_xprof_r5b"):
        fence(fjit(*args))
    print("trace -> /tmp/tank_xprof_r5b", flush=True)


if __name__ == "__main__":
    main()
