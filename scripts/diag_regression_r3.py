"""Round-3 diagnosis of the BENCH_r02 5x regression (VERDICT r2 #1).

Two coupled changes landed unbenched in bbde9ab:
  (a) _auto_region_rows: region_rows 24 -> 16 for D<=8 (stages 2/3), which
      shrinks the vertical support margin support_fits checks -> possible
      silent XLA-fallback dispatch on the bench geometry;
  (b) G-way step grouping in the kernel itself.

This script separates them: per stage shape (with the narrow refined bands
stages 2/3 actually see), report support_fits at rows=16 vs rows=24, and
time the views-fused kernel at B=6, V=4 (the bench's hot configuration).
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

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    B, V = 6, 4

    # bench.py's camera rig (intr_q is the stage1 intrinsics of a 1152x864
    # image: f=360, principal point W/8 x H/8)
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
        return rot[None].repeat(B, 0), tr[None].repeat(B, 0)

    def fence(x):
        return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))

    for name, (H, W, C, D, scale, band) in [
        ("stage1", (108, 144, 32, 48, 1.0, None)),
        ("stage2", (216, 288, 16, 8, 2.0, 8.0)),
        ("stage3", (432, 576, 8, 8, 4.0, 4.0)),
    ]:
        rots, trs = rig(scale)
        ref = jax.random.uniform(key, (B, H, W, C), jnp.bfloat16)
        srcs = jax.random.uniform(key, (B, V, H, W, C), jnp.bfloat16)
        if band is None:   # full sweep, inverse-depth spaced
            inv = np.linspace(1 / 425.0, 1 / 935.0, D, dtype=np.float32)
            dvals = (1.0 / inv)
            depth = jnp.asarray(np.broadcast_to(
                dvals[None, :, None, None], (B, D, H, W)).copy())
        else:              # narrow refined band around 600mm
            dvals = np.linspace(600 - band * D / 2, 600 + band * D / 2, D,
                                dtype=np.float32)
            depth = jnp.asarray(np.broadcast_to(
                dvals[None, :, None, None], (B, D, H, W)).copy())

        px, py = pw._project_views(rots, trs, depth, H, W)
        for rows in (16, 24):
            dc = pw._auto_depth_chunk(D, C, pw.TILE_ROWS * pw.TILE_COLS)
            Wa = max(pw.ALIGN_X, -(-W // pw.ALIGN_X) * pw.ALIGN_X)
            fits = bool(pw._support_fits_traced(
                px, py, H, W, H, Wa, C,
                region_rows=min(rows, H), region_cols=min(pw.REGION_COLS, Wa),
                depth_chunk=dc))
            print(f"{name}: support_fits(rows={rows}, DB={dc}) = {fits}",
                  flush=True)

        f = jax.jit(lambda r, s, ro, tr_, d: pw.warp_correlate_views_fused(
            r, s, ro, tr_, d, 1))
        for _ in range(2):
            fence(f(ref, srcs, rots, trs, depth))
        t0 = time.perf_counter()
        out = None
        for _ in range(10):
            out = f(ref, srcs, rots, trs, depth)
        fence(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"{name}: views-fused B={B} V={V}  {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
