"""End-to-end pipeline on a synthetic scene with the real checkpoint:
inference CLI -> PFM outputs -> dypcd fusion -> PLY, then verify the
network recovered the synthetic plane's depth and fusion kept points."""

import os

import numpy as np
import pytest

from synth_scene import build_scene

CKPT = "/root/reference/checkpoints/Effi_MVS_plus/model_dtu.ckpt"


@pytest.mark.slow
def test_full_pipeline_on_synthetic_plane(tmp_path):
    root = str(tmp_path / "data")
    out = str(tmp_path / "out")
    os.makedirs(root)
    # focal/baseline chosen for sound triangulation at this tiny size:
    # depth sensitivity z^2/(f*b) ~ 12.5 mm per px of matching error
    # (the original f=120/b=8 scene was ~90 mm/px — any pass was luck)
    _scan_dir, listfile = build_scene(root, n_views=4, H=64, W=96,
                                      depth_plane=600.0, focal=360.0,
                                      baseline=40.0)

    from effi_mvs_plus_tpu.cli import test_dtu
    # relaxed consistency thresholds: the tiny noisy synthetic scene can't
    # meet DTU's sub-mm ladder; the machinery under test is identical.
    test_dtu.main([
        "--testpath", root, "--testlist", listfile, "--loadckpt", CKPT,
        "--outdir", out, "--num_view", "4", "--max_h", "64", "--max_w", "96",
        "--num_worker", "1", "--conf", "0.01", "--diff_base", "40.0",
        "--dist_base", "4.0",
    ])

    from effi_mvs_plus_tpu.data.pfm import read_pfm
    depth = read_pfm(os.path.join(out, "scan1", "depth_est",
                                  "00000000.pfm"))[0]
    assert depth.shape == (64, 96)
    # the imported checkpoint must recover the 600mm plane
    assert abs(float(np.median(depth)) - 600.0) < 10.0

    from effi_mvs_plus_tpu.fuse.ply import read_ply
    xyz, rgb = read_ply(os.path.join(out, "mvsnet001_l3.ply"))
    assert len(xyz) > 500
    # fused-cloud median: loose bound — the 64x96 synthetic scene with
    # relaxed fusion thresholds averages in noisy reprojections, so the
    # median sits ~15mm below the plane; exact numerics are pinned by the
    # parity tests (test_ops_parity / test_model_golden / test_fusion).
    assert abs(float(np.median(xyz[:, 2])) - 600.0) < 25.0

    # pooled-fusion branch: spawn workers (pinned to CPU jax via env set
    # in the parent) re-fuse the saved maps and must reproduce the cloud
    serial = xyz
    os.remove(os.path.join(out, "mvsnet001_l3.ply"))
    test_dtu.main([
        "--testpath", root, "--testlist", listfile, "--loadckpt", CKPT,
        "--outdir", out, "--num_view", "4", "--max_h", "64", "--max_w", "96",
        "--num_worker", "2", "--conf", "0.01", "--diff_base", "40.0",
        "--dist_base", "4.0", "--skip_depth",
    ])
    xyz2, _ = read_ply(os.path.join(out, "mvsnet001_l3.ply"))
    assert xyz2.shape == serial.shape
    np.testing.assert_allclose(xyz2, serial, atol=1e-4)
