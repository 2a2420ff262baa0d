"""DTU chamfer evaluation — self-contained Python port of the MATLAB
protocol (/root/reference/evaluations/dtu/*.m), so the pipeline needs no
MATLAB:

1. ``reduce_pts``       — stochastic 0.2 mm-neighbourhood downsample of the
                          method cloud (reducePts_haa.m): visit points in a
                          random order; a still-kept point suppresses all
                          neighbours within dst.
2. chamfer distances    — data->stl (accuracy) and stl->data
                          (completeness) via cKDTree, distances clipped at
                          MaxDist=60 outside the STL bounding box
                          neighbourhood (MaxDistCP.m semantics).
3. masks                — accuracy uses only points inside the scan's
                          ObsMask voxel grid; completeness only STL points
                          above the ground plane (PointCompareMain.m).
4. stats                — 20 mm outlier cut; overall = (mean acc + mean
                          comp)/2 over the 22 eval scans
                          (ComputeStat_web.m:75-83).

ObsMask/Plane .mat files are read with scipy.io; STL ground truth with the
local PLY codec.
"""

from __future__ import annotations

import dataclasses

import numpy as np
from scipy.spatial import cKDTree


def reduce_pts(pts, dst=0.2, seed=0):
    """Stochastic downsample: no two kept points closer than dst.

    pts: (N,3).  Returns a boolean keep-mask.  Matches reducePts_haa.m's
    random-order suppression (the specific permutation differs — the
    protocol is stochastic by design; seeded here for reproducibility).
    """
    n = len(pts)
    keep = np.ones(n, bool)
    order = np.random.default_rng(seed).permutation(n)
    tree = cKDTree(pts)
    # query in chunks to bound memory
    chunk = 2_000_000
    for lo in range(0, n, chunk):
        ids = order[lo:lo + chunk]
        neigh = tree.query_ball_point(pts[ids], dst, workers=-1)
        for i, nb in zip(ids, neigh):
            if keep[i]:
                keep[nb] = False
                keep[i] = True
    return keep


def _chamfer(q_from, q_to, max_dist=60.0):
    """Distance from each q_from point to nearest q_to point, clipped to
    max_dist (MaxDistCP.m computes exact distances in MaxDist-sized blocks
    and defaults to MaxDist when no target point is near — a cKDTree query
    with distance_upper_bound reproduces that)."""
    if len(q_to) == 0:
        return np.full(len(q_from), max_dist, np.float64)
    tree = cKDTree(q_to)
    d, _ = tree.query(q_from, k=1, distance_upper_bound=max_dist, workers=-1)
    return np.minimum(d, max_dist)


@dataclasses.dataclass
class ScanResult:
    acc_mean: float
    comp_mean: float
    acc_median: float
    comp_median: float
    n_data: int
    n_stl: int


def evaluate_scan(method_pts, stl_pts, obs_mask, bb, res, ground_plane,
                  dst=0.2, max_dist=20.0, seed=0, prereduced=False):
    """Evaluate one scan.

    method_pts: (N,3) fused cloud; stl_pts: (M,3) structured-light GT
    (already 0.2mm-reduced, as shipped); obs_mask: 3-D bool voxel grid;
    bb: (2,3) bounding box [min;max]; res: voxel size; ground_plane: (4,)
    plane coefficients (P'*[x;1] > 0 means 'used').
    """
    if not prereduced:
        method_pts = method_pts[reduce_pts(method_pts, dst, seed)]

    d_data = _chamfer(method_pts, stl_pts)          # accuracy distances
    d_stl = _chamfer(stl_pts, method_pts)           # completeness distances

    # ObsMask voxel lookup (PointCompareMain.m:36-44, 1-based rounding)
    qv = np.round((method_pts - bb[0]) / res + 1).astype(np.int64)
    shape = obs_mask.shape
    in_grid = ((qv[:, 0] > 0) & (qv[:, 0] <= shape[0])
               & (qv[:, 1] > 0) & (qv[:, 1] <= shape[1])
               & (qv[:, 2] > 0) & (qv[:, 2] <= shape[2]))
    data_in_mask = np.zeros(len(method_pts), bool)
    gi = qv[in_grid] - 1
    data_in_mask[in_grid] = obs_mask[gi[:, 0], gi[:, 1], gi[:, 2]] != 0

    above = (stl_pts @ ground_plane[:3] + ground_plane[3]) > 0

    fd = d_data[data_in_mask]
    fd = fd[fd < max_dist]
    fs = d_stl[above]
    fs = fs[fs < max_dist]

    return ScanResult(
        acc_mean=float(fd.mean()) if len(fd) else float("nan"),
        comp_mean=float(fs.mean()) if len(fs) else float("nan"),
        acc_median=float(np.median(fd)) if len(fd) else float("nan"),
        comp_median=float(np.median(fs)) if len(fs) else float("nan"),
        n_data=len(fd), n_stl=len(fs))


def aggregate(results):
    """overall = (mean acc + mean comp) / 2 over scans."""
    acc = float(np.mean([r.acc_mean for r in results]))
    comp = float(np.mean([r.comp_mean for r in results]))
    return {"mean_acc_mm": acc, "mean_comp_mm": comp,
            "overall_mm": (acc + comp) / 2.0}


def load_obs_mask(path):
    """Read ObsMaskN_10.mat -> (obs_mask, bb, res)."""
    import scipy.io
    m = scipy.io.loadmat(path)
    return np.asarray(m["ObsMask"]), np.asarray(m["BB"], np.float64), \
        float(np.asarray(m["Res"]).squeeze())


def load_plane(path):
    import scipy.io
    m = scipy.io.loadmat(path)
    return np.asarray(m["P"], np.float64).reshape(-1)
