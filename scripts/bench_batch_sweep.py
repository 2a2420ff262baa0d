"""A/B the inference batch size at the DTU eval shape (1152x864, 5 views).

One TPU process sweeps the batch sizes; prints maps/s per B incrementally
(relay compiles are slow — run under nohup/timeout per the repo notes).

Measured (v5e): r1 kernel {4: 12.1, 6: 14.1, 8: 12.7}; r2 double-buffered
depth-chunked kernel — the pallas_warp.py revision at commit 303af2a,
restored at round-3 HEAD after the unbenched grouping rewrite regressed
5x (VERDICT r2 #1) — {6: 16.25, 8: 12.78, 10: 12.47, 12: 13.52}: B=6
stays the sweet spot (HBM pressure past B=6 outweighs the extra
amortization; B=12 recovers a little but never catches up).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

H, W, V = 864, 1152, 5
WARMUP, ITERS = 2, 6


def make_args(B, jnp, camio):
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
    proj_ms = {k: jnp.asarray(np.broadcast_to(
        np.stack([p[k] for p in projs])[None], (B, V, 2, 4, 4)).copy())
        for k in ("stage1", "stage2", "stage3")}
    depth_values = jnp.asarray(np.broadcast_to(
        camio.inverse_depth_values(425.0, 2.5 * 0.53, 384)[None],
        (B, 384)).copy())
    return (jnp.asarray(imgs), proj_ms["stage1"], proj_ms["stage2"],
            proj_ms["stage3"], depth_values)


def main():
    import jax
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.models import EffiMVSConfig, forward
    from effi_mvs_plus_tpu.io import load_torch_checkpoint
    from effi_mvs_plus_tpu.data import cams as camio

    params = load_torch_checkpoint(
        "/root/reference/checkpoints/Effi_MVS_plus/model_dtu.ckpt")
    cfg = EffiMVSConfig(compute_dtype=jnp.bfloat16)

    @jax.jit
    def run(imgs, s1, s2, s3, dv):
        out = forward(params, imgs, {"stage1": s1, "stage2": s2, "stage3": s3},
                      dv, cfg, ctx=None)
        return out["depth"][-1]

    def fence(x):
        return float(jax.device_get(jnp.ravel(x)[0]))

    fence(jnp.zeros((1, 1)))
    for B in (6, 8, 10, 12):
        try:
            args = make_args(B, jnp, camio)
            for _ in range(WARMUP):
                fence(run(*args))
            t0 = time.perf_counter()
            out = None
            for _ in range(ITERS):
                out = run(*args)
            fence(out)
            dt = (time.perf_counter() - t0) / ITERS
            print(f"B={B}: {dt * 1e3:8.1f} ms/iter  "
                  f"{B / dt:6.2f} maps/s", flush=True)
        except Exception as e:  # OOM at large B is an answer, not a failure
            print(f"B={B}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
