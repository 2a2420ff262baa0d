"""Full-forward A/B of the blocked conv groups — the deployment gate.

    timeout 7200 python scripts/ab_blocked_forward.py > /tmp/ab_blocked.log 2>&1

Isolated per-conv probes overstate blocked-conv wins 2-4x (XLA fuses
BN/ReLU/layout into in-net convs, so the isolated plain baseline is
slower than reality — round-4 finding).  This measures the FULL forward
at both deployment points for every impl-group combination; only a
combination that wins HERE may become an 'auto' default
(models/effi_mvs.py::forward).

  - T&T point: model_tank, scene content (tank_scene_rig), B=1 and B=2
  - DTU bench point: model_dtu, bench.py rig (noise content), B=6
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import tank_scene_rig as rig  # noqa: E402

COMBOS = [
    {},
    {"reg_impl": "blocked"},
    {"enc_impl": "blocked"},
    {"stem_impl": "blocked"},
    {"reg_impl": "blocked", "enc_impl": "blocked"},
    {"reg_impl": "blocked", "enc_impl": "blocked", "stem_impl": "blocked"},
]


def label(c):
    return "+".join(k[:-5] for k in sorted(c)) or "xla"


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.io import load_torch_checkpoint
    from effi_mvs_plus_tpu.models import EffiMVSConfig, forward
    from effi_mvs_plus_tpu.data import cams as camio

    def fence(x):
        return float(jax.device_get(jnp.ravel(x)[0]))

    fence(jnp.zeros(1))
    print("tunnel up", flush=True)

    results = []

    def bench(tag, params, cfg, args, B, iters=6):
        f = jax.jit(lambda i, s1, s2, s3, d: forward(
            params, i, {"stage1": s1, "stage2": s2, "stage3": s3}, d,
            cfg, ctx=None)["depth"][-1])
        y = f(*args)
        fence(y)
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f(*args)
        fence(y)
        dt = (time.perf_counter() - t0) / iters / B
        return dt

    # ---- T&T point ----
    params_t = load_torch_checkpoint(
        "/root/reference/checkpoints/Effi_MVS_plus/model_tank.ckpt")
    for B in (1, 2):
        imgs, pm, dv = rig.batch(B)
        args = (jnp.asarray(imgs), jnp.asarray(pm["stage1"]),
                jnp.asarray(pm["stage2"]), jnp.asarray(pm["stage3"]),
                jnp.asarray(dv))
        for combo in COMBOS:
            cfg = EffiMVSConfig(ndepths=rig.NDEPTHS,
                                compute_dtype=jnp.bfloat16, **combo)
            dt = bench(label(combo), params_t, cfg, args, B)
            row = {"point": f"tank.B{B}", "impl": label(combo),
                   "s_per_map": round(dt, 4),
                   "maps_per_s": round(1 / dt, 3)}
            results.append(row)
            print(row, flush=True)

    # ---- DTU bench point (bench.py rig) ----
    params_d = load_torch_checkpoint(
        "/root/reference/checkpoints/Effi_MVS_plus/model_dtu.ckpt")
    H, W, V, B = 864, 1152, 5, 6
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (B, V, H, W, 3)).astype(np.float32)
    intr_q = np.array([[360.0, 0, W / 8], [0, 360.0, H / 8], [0, 0, 1]],
                      np.float32)
    exts = [np.eye(4, dtype=np.float32)]
    for v in range(1, V):
        E = np.eye(4, dtype=np.float32)
        a = 0.02 * v
        c, s = np.cos(a), np.sin(a)
        E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        E[:3, 3] = [15.0 * v, 4.0 * v, 2.0 * v]
        exts.append(E)
    projs = [camio.stage_proj_matrices(E, intr_q) for E in exts]
    pm = {k: jnp.asarray(np.broadcast_to(
        np.stack([p[k] for p in projs])[None], (B, V, 2, 4, 4)).copy())
        for k in ("stage1", "stage2", "stage3")}
    dv = jnp.asarray(np.broadcast_to(
        camio.inverse_depth_values(425.0, 2.5 * 0.53, 384)[None],
        (B, 384)).copy())
    args = (jnp.asarray(imgs), pm["stage1"], pm["stage2"], pm["stage3"], dv)
    for combo in COMBOS:
        cfg = EffiMVSConfig(compute_dtype=jnp.bfloat16, **combo)
        dt = bench(label(combo), params_d, cfg, args, B, iters=8)
        row = {"point": "dtu.B6", "impl": label(combo),
               "s_per_map": round(dt, 4), "maps_per_s": round(1 / dt, 3)}
        results.append(row)
        print(row, flush=True)

    with open("/tmp/ab_blocked_forward.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
