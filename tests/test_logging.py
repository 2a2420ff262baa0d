"""Metrics writers: JSONL scalars, optional TB, image grids."""

import json
import os

import numpy as np

from effi_mvs_plus_tpu.utils.logging import (MetricsWriter, save_image_grid,
                                             _colorize)


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path), tensorboard=False)
    w.scalars(0, {"loss": 1.5}, prefix="train/")
    w.scalars(10, {"abs_err": 3.25})
    w.close()
    lines = [json.loads(ln) for ln in open(w.path)]
    assert lines[0]["train/loss"] == 1.5 and lines[0]["step"] == 0
    assert lines[1]["abs_err"] == 3.25 and lines[1]["step"] == 10


def test_colorize_and_image_grid(tmp_path):
    rng = np.random.default_rng(0)
    depth = rng.uniform(400, 900, (32, 48)).astype(np.float32)
    conf = rng.uniform(0, 1, (32, 48)).astype(np.float32)
    rgb = _colorize(depth)
    assert rgb.shape == (32, 48, 3) and rgb.dtype == np.uint8
    p = save_image_grid(str(tmp_path / "maps.png"),
                        {"depth": depth, "conf": conf})
    assert os.path.exists(p)
    from PIL import Image
    img = np.array(Image.open(p))
    assert img.shape[0] == 32 and img.shape[1] >= 96
