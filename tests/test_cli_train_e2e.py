"""End-to-end train-CLI smoke on a tiny synthetic DTU-training tree:
full driver path (reader -> loader -> jitted step -> metrics JSONL ->
checkpoint -> eval epoch), then resume."""

import functools
import json
import os

import numpy as np
import pytest


def _build_tiny_dtu_tree(root, n_views=3, img_wh=(160, 128)):
    """DTU-training layout at toy resolution (images img_wh, GT at 2x
    crop source size so the half+crop pipeline is exercised)."""
    from PIL import Image
    from effi_mvs_plus_tpu.data import cams as camio
    from effi_mvs_plus_tpu.data.pfm import save_pfm

    W, H = img_wh
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "Cameras", "train"), exist_ok=True)
    with open(os.path.join(root, "Cameras", "pair.txt"), "w") as f:
        f.write(f"{n_views}\n")
        for v in range(n_views):
            srcs = [s for s in range(n_views) if s != v]
            f.write(f"{v}\n{len(srcs)} "
                    + " ".join(f"{s} 10.0" for s in srcs) + "\n")

    K = np.array([[90.0, 0, W / 8], [0, 90.0, H / 8], [0, 0, 1]],
                 np.float32)
    for v in range(n_views):
        E = np.eye(4, dtype=np.float32)
        E[:3, 3] = [10.0 * v, 0, 0]
        camio.write_cam_file(
            os.path.join(root, "Cameras", "train", f"{v:08d}_cam.txt"),
            E, K, [425.0, 2.5])

    scan = "scan1"
    img_dir = os.path.join(root, "Rectified", f"{scan}_train")
    dep_dir = os.path.join(root, "Depths_raw", scan)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(dep_dir, exist_ok=True)
    for v in range(n_views):
        for light in range(7):
            img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                os.path.join(img_dir, f"rect_{v + 1:03d}_{light}_r5000.png"))
        depth = rng.uniform(430, 930, (H * 2 + 64, W * 2 + 64)).astype(
            np.float32)
        save_pfm(os.path.join(dep_dir, f"depth_map_{v:04d}.pfm"), depth)
        mask = np.full((H * 2 + 64, W * 2 + 64), 255, np.uint8)
        Image.fromarray(mask).save(
            os.path.join(dep_dir, f"depth_visual_{v:04d}.png"))

    listfile = os.path.join(root, "list.txt")
    with open(listfile, "w") as f:
        f.write("scan1\n")
    return listfile


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    from effi_mvs_plus_tpu.data.datasets import DTUTrainDataset
    from effi_mvs_plus_tpu.data.registry import register_dataset
    from effi_mvs_plus_tpu.cli import train as cli

    register_dataset(
        "dtu_tiny",
        functools.partial(DTUTrainDataset, crop_wh=(160, 128)))

    root = str(tmp_path / "data")
    os.makedirs(root)
    listfile = _build_tiny_dtu_tree(root)
    logdir = str(tmp_path / "run")

    argv = ["--mode", "train", "--dataset", "dtu_tiny",
            "--trainpath", root, "--trainlist", listfile,
            "--testlist", listfile, "--logdir", logdir,
            "--epochs", "1", "--batch_size", "4", "--trainviews", "3",
            "--testviews", "3", "--num_workers", "2",
            "--summary_freq", "1"]
    cli.main(argv)

    # checkpoint written, metrics JSONL has train + eval rows
    assert os.path.exists(os.path.join(logdir, "model_000000.ckpt"))
    rows = [json.loads(ln)
            for ln in open(os.path.join(logdir, "metrics.jsonl"))]
    assert any("train/loss" in r for r in rows)
    assert any(any(k.startswith("eval/") for k in r) for r in rows)
    losses = [r["train/loss"] for r in rows if "train/loss" in r]
    assert all(np.isfinite(losses))

    # resume path: epoch 1 continues from the saved checkpoint
    cli.main(argv + ["--resume", "--epochs", "2"])
    assert os.path.exists(os.path.join(logdir, "model_000001.ckpt"))


@pytest.mark.slow
def test_train_cli_model_parallel(tmp_path):
    """--model_parallel 2 with the default views,depth policy: the driver
    builds a (data=4, model=2) mesh over the 8 virtual devices and trains
    with view+depth sharding active — losses must stay finite."""
    from effi_mvs_plus_tpu.data.datasets import DTUTrainDataset
    from effi_mvs_plus_tpu.data.registry import register_dataset
    from effi_mvs_plus_tpu.cli import train as cli

    register_dataset(
        "dtu_tiny_mp",
        functools.partial(DTUTrainDataset, crop_wh=(160, 128)))

    root = str(tmp_path / "data")
    os.makedirs(root)
    listfile = _build_tiny_dtu_tree(root)
    logdir = str(tmp_path / "run")

    cli.main(["--mode", "train", "--dataset", "dtu_tiny_mp",
              "--trainpath", root, "--trainlist", listfile,
              "--testlist", listfile, "--logdir", logdir,
              "--epochs", "1", "--batch_size", "4", "--trainviews", "3",
              "--testviews", "3", "--num_workers", "2",
              "--summary_freq", "1", "--model_parallel", "2"])
    rows = [json.loads(ln)
            for ln in open(os.path.join(logdir, "metrics.jsonl"))]
    losses = [r["train/loss"] for r in rows if "train/loss" in r]
    assert losses and all(np.isfinite(losses))
