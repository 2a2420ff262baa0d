"""Host-side adjudication of the T&T rig's ~41 mm depth bias (VERDICT r4
weak #2), part 1: is the RIG itself consistent?

Brute-force photometric depth sweep, no model: for a grid of reference
pixels, warp each source view at densely sampled depths around the plane
(same projection math the model uses, core.geometry), bilinear-sample the
source image, and find the depth minimizing mean photometric error.  If
the rig (renderer + cameras + proj matrices) is consistent, the optimum
must sit at z=1.600 m to well under a stage-3 interval (~15 mm); a
systematic offset here means the BIAS IS IN THE RIG, not the model.

Also checks the direct identity: ref pixel -> plane point at z=1.6 ->
project to src -> sample src image == ref image value.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import tank_scene_rig as rig


def bilinear(img, x, y):
    """img (H,W,3); x,y float arrays -> sampled values (N,3), zeros OOB."""
    H, W = img.shape[:2]
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx, fy = x - x0, y - y0
    val = np.zeros(x.shape + (3,))
    ok = (x0 >= 0) & (x0 + 1 < W) & (y0 >= 0) & (y0 + 1 < H)
    x0c, y0c = np.clip(x0, 0, W - 2), np.clip(y0, 0, H - 2)
    v = (img[y0c, x0c] * ((1 - fx) * (1 - fy))[..., None]
         + img[y0c, x0c + 1] * (fx * (1 - fy))[..., None]
         + img[y0c + 1, x0c] * ((1 - fx) * fy)[..., None]
         + img[y0c + 1, x0c + 1] * (fx * fy)[..., None])
    val[ok] = v[ok]
    return val, ok


def main():
    K, exts = rig.cameras()
    views = rig.render_views(K, exts)          # (V,H,W,3) in [0,1]
    H, W, V = rig.H, rig.W, rig.V
    ref = views[0]

    # reference pixel grid (strided, away from borders)
    ys, xs = np.meshgrid(np.arange(128, H - 128, 64),
                         np.arange(128, W - 128, 64), indexing="ij")
    ys, xs = ys.ravel(), xs.ravel()

    # --- identity check at the true depth ---
    Kinv = np.linalg.inv(K)
    pix = np.stack([xs, ys, np.ones_like(xs)]).astype(np.float64)
    rays = Kinv @ pix                          # ref cam = identity extrinsic
    errs = []
    for v in range(1, V):
        E = exts[v]
        pts = rays * rig.PLANE_Z               # cam0 == world
        q = K @ (E[:3, :3] @ pts + E[:3, 3:4])
        sx, sy = q[0] / q[2], q[1] / q[2]
        sval, ok = bilinear(views[v], sx, sy)
        rval, _ = bilinear(ref, xs.astype(float), ys.astype(float))
        errs.append(np.abs(sval[ok] - rval[ok]).mean())
    print(f"identity check at z={rig.PLANE_Z}: per-view mean |dI| = "
          f"{np.array(errs).round(4).tolist()} (image range 0-1)")

    # --- dense photometric depth sweep ---
    depths = np.linspace(1.45, 1.75, 121)      # 2.5 mm steps
    rval, _ = bilinear(ref, xs.astype(float), ys.astype(float))
    cost = np.zeros((len(depths), len(xs)))
    cnt = np.zeros((len(depths), len(xs)))
    for di, d in enumerate(depths):
        for v in range(1, V):
            E = exts[v]
            pts = rays * d
            q = K @ (E[:3, :3] @ pts + E[:3, 3:4])
            sx, sy = q[0] / q[2], q[1] / q[2]
            sval, ok = bilinear(views[v], sx, sy)
            e = np.abs(sval - rval).mean(-1)
            cost[di] += np.where(ok, e, 0.0)
            cnt[di] += ok
    cost = cost / np.maximum(cnt, 1)
    best = depths[np.argmin(cost, axis=0)]
    print(f"photometric optimum over {len(xs)} pixels: "
          f"median {np.median(best)*1000:.1f} mm, "
          f"mean {best.mean()*1000:.1f} mm, "
          f"p10/p90 {np.percentile(best,10)*1000:.1f}/"
          f"{np.percentile(best,90)*1000:.1f} mm "
          f"(true {rig.PLANE_Z*1000:.0f} mm)")
    agg = cost.mean(1)
    print(f"aggregate-cost argmin: {depths[np.argmin(agg)]*1000:.1f} mm")
    # curve around the optimum for shape inspection
    sel = slice(max(0, np.argmin(agg) - 6), np.argmin(agg) + 7)
    for d, c in zip(depths[sel], agg[sel]):
        print(f"  z={d*1000:7.1f} mm  cost={c:.5f}")


if __name__ == "__main__":
    main()
