"""Cross-check eval/dtu.py against a loop-faithful transliteration of the
MATLAB oracle (/root/reference/evaluations/dtu/{reducePts_haa,MaxDistCP,
PointCompareMain,BaseEvalMain_web}.m).

MATLAB itself is unavailable offline, so the oracle here is a direct
per-line Python rendering of the .m sources — sequential random-order
suppression, blockwise 60 mm-tiled chamfer with the outside-tiling
default, 1-based rounded ObsMask lookup, plane cut, 20 mm outlier cut —
run on a synthetic scene that exercises every edge the protocol has:
points outside the BB block tiling, sub-plane STL points, >20 mm
outliers, duplicate points, and empty blocks.
"""

import numpy as np
from scipy.spatial import cKDTree

from effi_mvs_plus_tpu.eval.dtu import (reduce_pts, evaluate_scan,
                                        block_assigned_mask, _chamfer)


# --- oracle: literal renderings of the .m files -------------------------

def oracle_reduce_pts(pts, dst, order):
    """reducePts_haa.m: visit in `order`; a still-kept point suppresses
    all neighbours within dst (inclusive)."""
    n = len(pts)
    keep = np.ones(n, bool)
    tree = cKDTree(pts)
    neigh = tree.query_ball_point(pts[order], dst)
    for i, nb in zip(order, neigh):
        if keep[i]:
            keep[nb] = False
            keep[i] = True
    return keep


def oracle_max_dist_cp(q_to, q_from, bb, max_dist=60.0):
    """MaxDistCP.m: 60 mm block tiling anchored at BB(1,:); 'from' points
    outside the tiling keep the MaxDist default; per block the candidate
    'to' set is the +-MaxDist-expanded block (empty -> MaxDist)."""
    dist = np.full(len(q_from), max_dist, np.float64)
    rng_ = np.floor((bb[1] - bb[0]) / max_dist).astype(int)
    for x in range(rng_[0] + 1):
        for y in range(rng_[1] + 1):
            for z in range(rng_[2] + 1):
                low = bb[0] + np.array([x, y, z]) * max_dist
                high = low + max_dist
                inF = ((q_from >= low) & (q_from < high)).all(1)
                if not inF.any():
                    continue
                lo2, hi2 = low - max_dist, high + max_dist
                inT = ((q_to >= lo2) & (q_to < hi2)).all(1)
                if not inT.any():
                    dist[inF] = max_dist
                    continue
                d = np.sqrt(((q_from[inF][:, None] -
                              q_to[inT][None]) ** 2).sum(-1))
                dist[inF] = d.min(1)     # NOTE: unclipped, as in MATLAB
    return dist


def oracle_scan(method_pts, stl_pts, obs, bb, res, plane, max_dist=20.0):
    """PointCompareMain.m + BaseEvalMain_web.m:69-78 filtering/stats."""
    d_data = oracle_max_dist_cp(stl_pts, method_pts, bb)
    d_stl = oracle_max_dist_cp(method_pts, stl_pts, bb)
    qv = np.round((method_pts - bb[0]) / res + 1).astype(int)
    in_grid = ((qv > 0) & (qv <= np.array(obs.shape))).all(1)
    in_mask = np.zeros(len(method_pts), bool)
    g = qv[in_grid] - 1
    in_mask[in_grid] = obs[g[:, 0], g[:, 1], g[:, 2]] != 0
    above = (stl_pts @ plane[:3] + plane[3]) > 0
    fd = d_data[in_mask]
    fd = fd[fd < max_dist]
    fs = d_stl[above]
    fs = fs[fs < max_dist]
    return fd.mean(), fs.mean(), np.median(fd), np.median(fs)


# --- scene generator -----------------------------------------------------

def _scene(seed=0, n_stl=4000, n_extra=400):
    rng = np.random.default_rng(seed)
    # STL: bumpy surface over a 140x90 mm patch, some below the plane
    xy = rng.uniform([0, 0], [140, 90], (n_stl, 2))
    z = 10 * np.sin(xy[:, 0] / 15) + 5 * np.cos(xy[:, 1] / 9)
    stl = np.column_stack([xy, z])
    stl[: n_stl // 10, 2] -= 40.0               # below the ground plane
    # method: noisy surface + outliers + points outside the BB tiling +
    # duplicates
    method = stl + rng.normal(0, 0.4, stl.shape)
    method[:n_extra] += rng.uniform(25, 80, (n_extra, 3))    # >20mm outliers
    method = np.vstack([
        method,
        rng.uniform([-400, -400, -400], [-300, -300, -300], (60, 3)),
        method[:50],                             # exact duplicates
    ])
    bb = np.array([[-5, -5, -50], [145, 95, 25]], np.float64)
    res = 2.0
    shape = tuple(int(np.ceil((bb[1][i] - bb[0][i]) / res)) + 2
                  for i in range(3))
    obs = (rng.uniform(0, 1, shape) > 0.15).astype(np.uint8)  # holes
    plane = np.array([0.0, 0.0, 1.0, 30.0])      # z > -30 is 'used'
    return method, stl, obs, bb, res, plane


# --- tests ---------------------------------------------------------------

def test_vectorized_reduce_matches_sequential_greedy():
    rng = np.random.default_rng(7)
    pts = rng.uniform(0, 12, (4000, 3))
    pts = np.vstack([pts, pts[:100]])            # duplicates
    for seed in (0, 3):
        order = np.random.default_rng(seed).permutation(len(pts))
        ours = reduce_pts(pts, dst=0.5, seed=seed)
        orc = oracle_reduce_pts(pts, 0.5, order)
        assert (ours == orc).all(), (ours.sum(), orc.sum())


def test_chamfer_matches_blockwise_oracle():
    method, stl, obs, bb, res, plane = _scene()
    ours = _chamfer(method, stl, bb)
    orc = oracle_max_dist_cp(stl, method, bb)
    # MATLAB leaves in-block exact distances unclipped above 60; ours clips
    # — both are > the 20 mm stat cut, so compare after min(60)
    np.testing.assert_allclose(np.minimum(ours, 60.0),
                               np.minimum(orc, 60.0), atol=1e-9)
    # points outside the tiling really are excluded
    outside = ~block_assigned_mask(method, bb)
    assert outside.sum() >= 60
    assert (ours[outside] == 60.0).all()


def test_evaluate_scan_matches_full_oracle():
    method, stl, obs, bb, res, plane = _scene()
    r = evaluate_scan(method, stl, obs, bb, res, plane, prereduced=True)
    acc, comp, acc_med, comp_med = oracle_scan(method, stl, obs, bb, res,
                                               plane)
    np.testing.assert_allclose(r.acc_mean, acc, rtol=1e-12)
    np.testing.assert_allclose(r.comp_mean, comp, rtol=1e-12)
    np.testing.assert_allclose(r.acc_median, acc_med, rtol=1e-12)
    np.testing.assert_allclose(r.comp_median, comp_med, rtol=1e-12)


def test_reduce_pts_scales():
    """Vectorised reduce at a realistic density stays fast (the old
    per-point loop took minutes at this size)."""
    import time
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 120, (1_000_000, 3)).astype(np.float64)
    t0 = time.perf_counter()
    keep = reduce_pts(pts, dst=0.2)
    dt = time.perf_counter() - t0
    assert dt < 30.0, f"reduce_pts too slow: {dt:.1f}s"
    kept = pts[keep]
    d, _ = cKDTree(kept).query(kept, k=2, workers=-1)
    assert d[:, 1].min() >= 0.2 - 1e-9
