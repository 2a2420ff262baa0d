"""Round-3 parameter sweep for the pallas warp kernel at the DTU bench
rig (B=6, V=4): region_rows x depth_chunk per stage, verifying support
fit and numerics per config.  Targets VERDICT r2 #4 (stage MXU
efficiency): QrC scales matmul FLOPs linearly in region_rows; DB
amortizes per-step fixed cost.

Run: timeout 3000 python scripts/sweep_warp_params_r3.py [stage1|stage2|stage3]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from effi_mvs_plus_tpu.core import geometry
    from effi_mvs_plus_tpu.ops import pallas_warp as pw

    only = sys.argv[1] if len(sys.argv) > 1 else None
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    B, V = 6, 4
    W0, H0 = 1152, 864

    def rig(scale):
        intr = np.array([[360.0 * scale, 0, W0 / 8 * scale],
                         [0, 360.0 * scale, H0 / 8 * scale],
                         [0, 0, 1]], np.float32)
        Ps = []
        for v in range(V + 1):
            E = np.eye(4, dtype=np.float32)
            a = 0.02 * v
            c, s = np.cos(a), np.sin(a)
            E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                                 np.float32)
            E[:3, 3] = [15.0 * v, 4.0 * v, 2.0 * v]
            P = np.eye(4, dtype=np.float32)
            P[:3, :4] = intr @ E[:3, :4]
            Ps.append(P)
        ref_P = jnp.asarray(np.stack([Ps[0]] * V))
        src_P = jnp.asarray(np.stack(Ps[1:]))
        rot, tr = geometry.relative_projection(src_P, ref_P)
        rot = jnp.broadcast_to(rot[None], (B, V, 3, 3))
        tr = jnp.broadcast_to(tr[None], (B, V, 3))
        return rot, tr

    def fence(x):
        return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))

    stages = [
        ("stage1", 108, 144, 32, 48, 1.0, None),
        ("stage2", 216, 288, 16, 8, 2.0, (620.0, 700.0)),
        ("stage3", 432, 576, 8, 8, 4.0, (650.0, 670.0)),
    ]
    for name, H, W, C, D, scale, band in stages:
        if only and name != only:
            continue
        rots, trs = rig(scale)
        ref = jax.random.uniform(key, (B, H, W, C), jnp.bfloat16)
        srcs = jax.random.uniform(key, (B, V, H, W, C), jnp.bfloat16)
        if band is None:
            inv = np.linspace(1 / 425.0, 1 / 935.0, D, dtype=np.float32)
            dvals = 1.0 / inv
        else:
            dvals = np.linspace(band[0], band[1], D, dtype=np.float32)
        depth = jnp.asarray(np.broadcast_to(
            dvals[None, :, None, None], (B, D, H, W)).copy())

        px, py = pw._project_views(rots, trs, depth, H, W)
        Wa = max(pw.ALIGN_X, -(-W // pw.ALIGN_X) * pw.ALIGN_X)

        baseline = None
        for rows in (24, 20, 16):
            for db in (2, 4, 6, 8):
                if D % db:
                    continue
                fits = bool(jax.jit(
                    lambda px, py, _r=rows, _db=db: pw._support_fits_traced(
                        px, py, H, W, H, Wa, C,
                        region_rows=min(_r, H),
                        region_cols=min(pw.REGION_COLS, Wa),
                        depth_chunk=_db))(px, py))
                if not fits:
                    print(f"{name} rows={rows} DB={db}: support DOES NOT "
                          f"fit — skipped", flush=True)
                    continue
                try:
                    f = jax.jit(
                        lambda r, s, ro, t, d, _r=rows, _db=db:
                        pw._plane_sweep_correlate_views(
                            r, s, ro, t, d, region_rows=_r, depth_chunk=_db))
                    out = f(ref, srcs, rots, trs, depth)
                    if baseline is None:
                        baseline = np.asarray(out, np.float32)
                        err = 0.0
                    else:
                        err = float(np.max(np.abs(
                            np.asarray(out, np.float32) - baseline)))
                    for _ in range(2):
                        fence(f(ref, srcs, rots, trs, depth))
                    t0 = time.perf_counter()
                    o = None
                    for _ in range(8):
                        o = f(ref, srcs, rots, trs, depth)
                    fence(o)
                    dt = (time.perf_counter() - t0) / 8
                    print(f"{name} rows={rows} DB={db}: {dt*1e3:8.2f} ms "
                          f"(B={B},V={V})  maxdiff {err:.2e}", flush=True)
                except Exception as e:
                    print(f"{name} rows={rows} DB={db}: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
