"""Shape-bucketing in the inference engine (VERDICT r2 #6): scenes with
different native sizes share one compiled executable; padded-run depths
match dedicated-compile depths away from the pad rim."""

import numpy as np
import jax

from effi_mvs_plus_tpu.models import EffiMVSConfig, init_params
from effi_mvs_plus_tpu.infer.engine import InferenceEngine
from effi_mvs_plus_tpu.data import cams as camio


def make_batch(B, V, H, W):
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (B, V, H, W, 3)).astype(np.float32)
    f = 1.3 * W / 8
    intr = np.array([[f, 0, W / 16], [0, f, H / 16], [0, 0, 1]], np.float32)
    projs = []
    for v in range(V):
        E = np.eye(4, dtype=np.float32)
        a = 0.03 * v
        c, s = np.cos(a), np.sin(a)
        E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        E[:3, 3] = [10.0 * v, 2.0 * v, 1.0 * v]
        projs.append(camio.stage_proj_matrices(E, intr))
    proj_ms = {k: np.broadcast_to(
        np.stack([p[k] for p in projs])[None], (B, V, 2, 4, 4)).copy()
        for k in ("stage1", "stage2", "stage3", "stage4")}
    dv = np.broadcast_to(
        camio.inverse_depth_values(425.0, 2.5 * 0.53, 64)[None],
        (B, 64)).copy()
    return {"imgs": imgs, "proj_matrices": proj_ms, "depth_values": dv}


def test_bucketed_shapes_share_one_executable():
    cfg = EffiMVSConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = InferenceEngine(params, cfg, buckets=[(64, 96)])

    d1, c1 = eng.infer_batch(make_batch(1, 3, 64, 96))
    n_after_first = eng._fn._cache_size()
    d2, c2 = eng.infer_batch(make_batch(1, 3, 64, 64))
    assert eng._fn._cache_size() == n_after_first, \
        "second native size must reuse the bucket executable"
    assert d1.shape == (1, 64, 96) and d2.shape == (1, 64, 64)
    assert c1.shape == (1, 32, 48) and c2.shape == (1, 32, 32)
    assert np.isfinite(d2).all()


def test_bucketed_depth_matches_dedicated_compile_interior():
    cfg = EffiMVSConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch = make_batch(1, 3, 64, 64)

    direct = InferenceEngine(params, cfg).infer_batch(batch)[0]
    bucketed = InferenceEngine(
        params, cfg, buckets=[(64, 96)]).infer_batch(batch)[0]
    assert bucketed.shape == direct.shape
    # the pad rim only perturbs a receptive-field-wide band at the padded
    # (right) edge; the left interior must agree
    interior_direct = direct[:, :, :32]
    interior_bucketed = bucketed[:, :, :32]
    denom = np.abs(interior_direct).mean()
    rel = np.abs(interior_bucketed - interior_direct).mean() / denom
    assert rel < 0.05, f"interior depths diverge: rel {rel:.4f}"


def test_bucket_pad_numerics_depth_and_conf_interior(    ):
    """VERDICT r4 weak #7: pin padded-bucket vs native-shape numerics on
    the real-area pixels — BOTH dims padded, and the H/2 confidence crop
    included.  Away from a receptive-field-wide band at the padded
    (bottom/right) edges the two executables compute the same function of
    the same inputs, so the agreement bound is float-noise-tight, not the
    5%-class sanity bound of the older interior test."""
    cfg = EffiMVSConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    H, W = 96, 128
    batch = make_batch(1, 3, H, W)

    d_direct, c_direct = InferenceEngine(params, cfg).infer_batch(batch)
    d_bucket, c_bucket = InferenceEngine(
        params, cfg, buckets=[(128, 160)]).infer_batch(batch)

    assert d_bucket.shape == (1, H, W)
    assert c_bucket.shape == (1, H // 2, W // 2)

    # margin: FPN stem (4 levels of 5x5 stride-2) + 3x3 GRU stacks reach
    # ~40 full-res px from the pad seam; 48 px leaves a real interior
    m = 48
    di_d, di_b = d_direct[:, :H - m, :W - m], d_bucket[:, :H - m, :W - m]
    rel = np.abs(di_b - di_d) / np.maximum(np.abs(di_d), 1e-6)
    assert rel.max() < 1e-3, f"depth interior max rel {rel.max():.2e}"

    mc = m // 2
    ci_d = c_direct[:, :H // 2 - mc, :W // 2 - mc]
    ci_b = c_bucket[:, :H // 2 - mc, :W // 2 - mc]
    cdiff = np.abs(ci_b - ci_d)
    assert cdiff.max() < 1e-3, f"conf interior max |diff| {cdiff.max():.2e}"


def test_no_bucket_larger_than_all_falls_through():
    cfg = EffiMVSConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = InferenceEngine(params, cfg, buckets=[(32, 32)])
    d, c = eng.infer_batch(make_batch(1, 3, 64, 96))   # larger than bucket
    assert d.shape == (1, 64, 96)
