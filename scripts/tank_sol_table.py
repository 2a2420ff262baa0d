"""T&T speed-of-light table (VERDICT r4 missing #3): per-stage warp-kernel
MXU roofs at the T&T deployment shapes (1056x1920, 11 views, 96/8/8),
derived from the deployed window policy / depth-chunk rules — the honest
denominator for "how much is left" at the config that gates the 2x bound.

The kernel's per-(grid step) matmul is (region_rows*C) x region_cols x
(DB*P) x 2 FLOPs; steps per source view = tiles * D/DB.  v5e bf16 MXU
roof ~197 TFLOP/s.  Run on any backend (pure arithmetic):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/tank_sol_table.py [dtu]
"""

import sys

sys.path.insert(0, "/root/repo")

MXU_TFLOPS = 197.0


def table(H, W, V, ndepths, label):
    from effi_mvs_plus_tpu.ops import pallas_warp as pw
    print(f"== {label}: {H}x{W}, {V} views ({V - 1} src), "
          f"ndepths {ndepths} ==")
    print(f"{'stage':8s} {'shape':14s} {'win(tc,rc,rows1)':18s} "
          f"{'DB16':4s} {'T':5s} {'GFLOP/view r16':14s} {'r16 roof ms/view':16s}"
          f" {'rows1 GFLOP':11s}")
    total16 = 0.0
    for s, (scale, C) in enumerate(((8, 32), (4, 16), (2, 8))):
        h, w = H // scale, W // scale
        D = ndepths[s]
        tc, rc, rows1 = pw._window_policy(C, D)
        Wa = max(pw.ALIGN_X, -(-w // pw.ALIGN_X) * pw.ALIGN_X)
        rc_eff = min(rc, Wa)
        P = pw.TILE_ROWS * tc
        Th = -(-h // pw.TILE_ROWS)
        Tw = -(-w // tc)
        T = Th * Tw
        rows = []
        for rr in (16, rows1):
            db = pw._auto_depth_chunk(D, C, P, region_rows=rr)
            steps = T * (D // db)
            gflop = steps * (rr * C) * rc_eff * (db * P) * 2 / 1e9
            rows.append((rr, db, steps, gflop))
        r16, r1 = rows
        roof16 = r16[3] / MXU_TFLOPS     # GFLOP / (TFLOP/s) = ms
        total16 += roof16 * (V - 1)
        print(f"stage{s + 1:d}   {h}x{w:<9d} ({tc},{rc_eff},r{rows1})"
              f"{'':6s}{r16[1]:<5d}{T:<6d}{r16[3]:<15.1f}{roof16:<17.2f}"
              f"{r1[3]:.1f}")
    print(f"all-stage rows16 warp roof: {total16:.1f} ms/map "
          f"({V - 1} src views)\n")
    return total16


if __name__ == "__main__":
    if "dtu" in sys.argv[1:]:
        table(864, 1152, 5, (48, 8, 8), "DTU eval point")
    else:
        table(1056, 1920, 11, (96, 8, 8), "T&T deployment point")
        table(864, 1152, 5, (48, 8, 8), "DTU eval point")
