"""Error-coloured OBJ export (BaseEval2Obj_web.m port): artifact fields,
colour formula, and file round-trip."""

import numpy as np

from effi_mvs_plus_tpu.eval import dtu as E


def _scene():
    """Tiny scan: a plane of GT points, a method cloud offset by known
    distances, a permissive ObsMask."""
    rng = np.random.default_rng(0)
    stl = np.stack([rng.uniform(0, 10, 200), rng.uniform(0, 10, 200),
                    np.zeros(200)], 1)
    method = stl + np.array([0, 0, 1.0])          # exactly 1 mm off
    bb = np.array([[-5.0, -5.0, -5.0], [15.0, 15.0, 15.0]])
    res = 0.5
    shape = tuple(np.ceil((bb[1] - bb[0]) / res).astype(int) + 2)
    obs = np.ones(shape, bool)
    plane = np.array([0.0, 0.0, 1.0, 1.0])        # everything above
    return method, stl, obs, bb, res, plane


def test_artifacts_populated_and_consistent():
    method, stl, obs, bb, res, plane = _scene()
    r = E.evaluate_scan(method, stl, obs, bb, res, plane, dst=0.01,
                        return_artifacts=True)
    assert r.q_data is not None and len(r.q_data) == len(r.d_data)
    assert len(r.q_stl) == len(r.d_stl) == len(r.stl_above_plane)
    np.testing.assert_allclose(r.d_data, 1.0, atol=1e-9)
    np.testing.assert_allclose(r.d_stl, 1.0, atol=1e-9)
    assert r.data_in_mask.all() and r.stl_above_plane.all()
    # default call keeps the result light
    r2 = E.evaluate_scan(method, stl, obs, bb, res, plane, dst=0.01)
    assert r2.q_data is None


def test_obj_export_colors_and_roundtrip(tmp_path):
    method, stl, obs, bb, res, plane = _scene()
    r = E.evaluate_scan(method, stl, obs, bb, res, plane, dst=0.01,
                        return_artifacts=True)
    # force one excluded point to exercise the green/blue branch
    r.data_in_mask = r.data_in_mask.copy()
    r.data_in_mask[0] = False
    acc_path, comp_path = E.export_error_obj(r, "mvsnet", 1, str(tmp_path))

    rows = [ln.split() for ln in open(acc_path)]
    assert all(row[0] == "v" and len(row) == 7 for row in rows)
    vals = np.array([[float(x) for x in row[1:]] for row in rows])
    np.testing.assert_allclose(vals[:, :3], r.q_data, atol=1e-5)
    # 1 mm error, threshold 10 -> alpha 0.1: included = (1, .9, .9)
    np.testing.assert_allclose(vals[1, 3:], [1.0, 0.9, 0.9], atol=1e-5)
    # excluded = green*alpha + blue*(1-alpha) = (0, .1, .9)
    np.testing.assert_allclose(vals[0, 3:], [0.0, 0.1, 0.9], atol=1e-5)

    rows = [ln.split() for ln in open(comp_path)]
    assert len(rows) == len(r.q_stl)


def test_export_requires_artifacts(tmp_path):
    method, stl, obs, bb, res, plane = _scene()
    r = E.evaluate_scan(method, stl, obs, bb, res, plane, dst=0.01)
    try:
        E.export_error_obj(r, "m", 1, str(tmp_path))
    except ValueError:
        return
    raise AssertionError("expected ValueError without artifacts")
