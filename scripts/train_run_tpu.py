"""Several-hundred-step DTU-shape TPU training run (VERDICT r1 #9):
convergence evidence beyond step timing.  Synthetic textured-plane scenes
(exact analytic GT depth) at 512x640, 5 views, batch 4, bf16 — the
reference's training resolution (dtu_yao crop 640x512, train.sh:22).

Logs every step to metrics_train_r02.jsonl and writes a TRAIN_r02.json
summary artifact.  Run standalone:
    timeout 7200 python scripts/train_run_tpu.py > /tmp/train_run.log 2>&1
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

B, V, H, W = 4, 5, 512, 640
STEPS = 300
POOL = 4          # distinct batches cycled -> 16 distinct samples
LOG = "/root/repo/metrics_train_r02.jsonl"
ART = "/root/repo/TRAIN_r02.json"


def make_batch(rng, camio):
    f = 500.0
    K_full = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    imgs = np.zeros((B, V, H, W, 3), np.float32)
    gt = {k: np.zeros((B, H // s, W // s), np.float32)
          for k, s in (("stage1", 8), ("stage2", 4), ("stage3", 2),
                       ("stage4", 1))}
    projs = None
    proj_ms = {}
    tex = rng.uniform(0, 1, (256, 256, 3)).astype(np.float32)
    for b in range(B):
        dp = rng.uniform(500.0, 820.0)
        exts = []
        for v in range(V):
            E = np.eye(4, dtype=np.float32)
            a = 0.012 * (v - V / 2) + rng.uniform(-0.002, 0.002)
            c, s = np.cos(a), np.sin(a)
            E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                                 np.float32)
            E[:3, 3] = [9.0 * v, 2.0 * v, 0.0]
            exts.append(E)
        # render each view + analytic ref-view GT depth
        for v, E in enumerate(exts):
            ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
            pix = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3).T
            rays = np.linalg.inv(K_full) @ pix
            R, t = E[:3, :3], E[:3, 3]
            cam_origin = -R.T @ t
            dirs = R.T @ rays
            lam = (dp - cam_origin[2]) / dirs[2]
            pts = cam_origin[:, None] + dirs * lam
            u = np.abs(pts[0] / 3.0) % 256
            vv = np.abs(pts[1] / 3.0) % 256
            imgs[b, v] = tex[vv.astype(int), u.astype(int)].reshape(H, W, 3)
            if v == 0:
                depth_cam = (R @ pts + t[:, None])[2].reshape(H, W)
                for k, s in (("stage1", 8), ("stage2", 4), ("stage3", 2),
                             ("stage4", 1)):
                    gt[k][b] = depth_cam[::s, ::s].astype(np.float32)
        K_q = K_full.copy()
        K_q[:2] /= 4.0
        projs = [camio.stage_proj_matrices(E, K_q) for E in exts]
        for k in ("stage1", "stage2", "stage3", "stage4"):
            stack = np.stack([p[k] for p in projs])
            proj_ms.setdefault(k, []).append(stack)
    proj_ms = {k: np.stack(v) for k, v in proj_ms.items()
               if k in ("stage1", "stage2", "stage3")}
    dv = np.broadcast_to(
        camio.inverse_depth_values(425.0, 2.5 * 0.53, 384)[None],
        (B, 384)).copy()
    mask = {k: np.ones_like(v) for k, v in gt.items()}
    return {"imgs": imgs, "proj_matrices": proj_ms, "depth_values": dv,
            "depth": gt, "mask": mask}


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.data import cams as camio
    from effi_mvs_plus_tpu.models import EffiMVSConfig, init_params
    from effi_mvs_plus_tpu.train.optim import make_optimizer
    from effi_mvs_plus_tpu.train.trainer import make_train_step

    cfg = EffiMVSConfig(compute_dtype=jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt, _ = make_optimizer(1e-3, STEPS, params=params)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)

    rng_np = np.random.default_rng(0)
    print("building synthetic batches ...", flush=True)
    pool = [make_batch(rng_np, camio) for _ in range(POOL)]
    pool = [{k: (jax.device_put(v) if not isinstance(v, dict)
                 else {kk: jax.device_put(vv) for kk, vv in v.items()})
             for k, v in b.items()} for b in pool]

    def fence(x):
        return float(jax.device_get(jnp.ravel(x)[0]))

    fence(jnp.zeros((1,)))
    print("tunnel up", flush=True)
    rng = jax.random.PRNGKey(0)
    t_first = time.perf_counter()
    losses, errs = [], []
    with open(LOG, "w") as fo:
        t0 = time.perf_counter()
        for i in range(STEPS):
            params, opt_state, m = step(params, opt_state, pool[i % POOL],
                                        jax.random.fold_in(rng, i))
            loss = float(m["loss"])
            err = float(m["abs_depth_error"])
            dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            losses.append(loss)
            errs.append(err)
            fo.write(json.dumps({"step": i, "loss": round(loss, 5),
                                 "abs_depth_error": round(err, 4),
                                 "s": round(dt, 3)}) + "\n")
            if i % 20 == 0 or i == STEPS - 1:
                fo.flush()
                print(f"step {i}: loss {loss:.4f} abs_err {err:.2f}mm "
                      f"({dt:.2f}s)", flush=True)
    total = time.perf_counter() - t_first

    art = {
        "ok": bool(np.isfinite(losses).all()
                   and np.mean(errs[-20:]) < np.mean(errs[:20])),
        "config": {"B": B, "V": V, "H": H, "W": W, "steps": STEPS,
                   "distinct_samples": POOL * B, "dtype": "bfloat16"},
        "loss_first20_mean": round(float(np.mean(losses[:20])), 4),
        "loss_last20_mean": round(float(np.mean(losses[-20:])), 4),
        "abs_err_first20_mean_mm": round(float(np.mean(errs[:20])), 3),
        "abs_err_last20_mean_mm": round(float(np.mean(errs[-20:])), 3),
        "s_per_step_steady": round(float(np.median(
            [json.loads(l)["s"] for l in open(LOG)][10:])), 3),
        "total_s": round(total, 1),
        "log": "metrics_train_r02.jsonl",
    }
    with open(ART, "w") as fo:
        json.dump(art, fo, indent=1)
    print(json.dumps(art), flush=True)


if __name__ == "__main__":
    main()
