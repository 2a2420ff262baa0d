"""DTU chamfer-protocol tests on synthetic geometry with known answers."""

import numpy as np

from effi_mvs_plus_tpu.eval.dtu import (reduce_pts, evaluate_scan, aggregate,
                                        ScanResult)


def test_reduce_pts_enforces_min_distance():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 10, (5000, 3))
    keep = reduce_pts(pts, dst=0.5)
    kept = pts[keep]
    from scipy.spatial import cKDTree
    d, _ = cKDTree(kept).query(kept, k=2)
    assert d[:, 1].min() >= 0.5 - 1e-9
    # dense cluster collapses to one point
    cluster = np.zeros((100, 3)) + 0.001 * rng.standard_normal((100, 3))
    keep_c = reduce_pts(cluster, dst=0.5)
    assert keep_c.sum() == 1


def test_evaluate_scan_known_offsets():
    # GT plane z=0 grid; method points offset by +0.1 in z
    g = np.stack(np.meshgrid(np.arange(0, 10, 0.5), np.arange(0, 10, 0.5),
                             indexing="ij"), -1).reshape(-1, 2)
    stl = np.concatenate([g, np.zeros((len(g), 1))], 1)
    method = stl + np.array([0, 0, 0.1])

    bb = np.array([[-1, -1, -1], [11, 11, 11]], np.float64)
    res = 0.5
    shape = tuple(int(np.ceil((bb[1][i] - bb[0][i]) / res)) + 2
                  for i in range(3))
    obs = np.ones(shape, np.uint8)
    plane = np.array([0, 0, 1, 0.05])   # everything above z=-0.05

    r = evaluate_scan(method, stl, obs, bb, res, plane, dst=0.2,
                      prereduced=True)
    assert abs(r.acc_mean - 0.1) < 1e-6
    assert abs(r.comp_mean - 0.1) < 1e-6

    agg = aggregate([r, ScanResult(0.3, 0.5, 0, 0, 1, 1)])
    assert abs(agg["overall_mm"] - ((0.1 + 0.3) / 2 + (0.1 + 0.5) / 2) / 2) \
        < 1e-9


def test_evaluate_scan_masks():
    # method has an outlier far away and a point outside the ObsMask:
    # both must be excluded from accuracy
    stl = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    method = np.array([[0, 0, 0.05],        # good, in mask
                       [50, 50, 50],        # outside mask + >20mm
                       [0, 1, 0.05]], np.float64)
    bb = np.array([[-1, -1, -1], [2, 2, 2]], np.float64)
    res = 0.5
    shape = (8, 8, 8)
    obs = np.ones(shape, np.uint8)
    plane = np.array([0, 0, 1, 1.0])
    r = evaluate_scan(method, stl, obs, bb, res, plane, prereduced=True)
    assert abs(r.acc_mean - 0.05) < 1e-9
    assert r.n_data == 2
