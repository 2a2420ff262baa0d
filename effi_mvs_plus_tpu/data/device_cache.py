"""HBM-resident dataset cache with on-device batch assembly.

The reference streams every batch host->device each step
(DataLoader + tocuda, /root/reference/train.py:229-236).  On TPU that
wastes the input link whenever the underlying data is small enough to
live in HBM: DTU-style MVS metas are combinatorial (scan x ref x light
with random source views), so thousands of training samples share a few
hundred distinct images/GT maps.  This cache uploads each distinct view
ONCE (images as uint8 — an exact round-trip of the 8-bit sources — GT
pyramids in f32) and assembles batches on device with gathers inside a
jitted function; the per-step host->device traffic is a handful of int32
index rows.

This is load-bearing in this environment: the TPU relay's host->device
path measures ~40 MB/s AND leaks the host copy of every transferred
buffer (measured 78 MB RSS growth per 78 MB device_put, 2026-08-19) —
streaming 130 MB batches OOM-kills a multi-epoch run.  With the cache, a
full epoch transfers kilobytes.

Scope: DTUTrainDataset-layout readers (train + val splits).  The cache
refuses to build beyond `budget_bytes` (full-size DTU at 79x49x7 lights
does NOT fit a 16 GB v5e — stream that with data/loader.py instead).
"""

from __future__ import annotations

import numpy as np


class DeviceCacheLoader:
    """Loader-compatible iterable (``__len__`` + ``__iter__`` yielding
    batch pytrees of on-device arrays) backed by an HBM cache."""

    def __init__(self, dataset, batch_size, shuffle=False, seed=0,
                 drop_last=False, budget_bytes=8 << 30):
        import jax
        import jax.numpy as jnp
        from PIL import Image
        from effi_mvs_plus_tpu.data import cams as camio
        import os

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

        # dedupe image rows by realpath: datasets that alias light
        # conditions via symlinks (or repeat views) share one HBM row
        img_keys, gt_keys, path_rows = {}, {}, {}
        for scan, light, ref, srcs in dataset.metas:
            for vid in [ref] + list(srcs):
                k = (scan, light, vid)
                if k not in img_keys:
                    rp = os.path.realpath(dataset.image_path(scan, light, vid))
                    img_keys[k] = path_rows.setdefault(rp, len(path_rows))
            gt_keys.setdefault((scan, ref), len(gt_keys))
        self._img_keys, self._gt_keys = img_keys, gt_keys
        self._path_rows = path_rows

        # size check before any upload (rows hold the CROPPED images)
        native = np.asarray(Image.open(next(iter(path_rows))))
        native_hw = native.shape[:2]
        probe = dataset.crop_image(native)
        est = (len(path_rows) * probe.nbytes
               + len(gt_keys) * probe.shape[0] * probe.shape[1] * 4 * 2
               * 1.33)
        if est > budget_bytes:
            raise ValueError(
                f"device cache would need ~{est / 1e9:.1f} GB "
                f"(> {budget_bytes / 1e9:.1f} GB budget); use the "
                "streaming Loader for datasets that exceed HBM")

        imgs = np.zeros((len(path_rows),) + probe.shape, np.uint8)
        for rp, row in path_rows.items():
            imgs[row] = dataset.crop_image(np.asarray(Image.open(rp)))

        depth, mask = None, None
        for (scan, vid), row in gt_keys.items():
            d_ms, m_ms = dataset.load_gt_pyramids(scan, vid)
            if depth is None:
                depth = {k: np.zeros((len(gt_keys),) + v.shape, np.float32)
                         for k, v in d_ms.items()}
                mask = {k: np.zeros((len(gt_keys),) + v.shape, np.uint8)
                        for k, v in m_ms.items()}
            for k in depth:
                depth[k][row] = d_ms[k]
                mask[k][row] = m_ms[k] > 0.5

        vids = sorted({vid for (_, _, vid) in img_keys})
        self._vid_row = {v: i for i, v in enumerate(vids)}
        projs, dvals = {}, []
        for vid in vids:
            ext, intr, depth_min = dataset.camera(vid, native_hw)
            ps = camio.stage_proj_matrices(ext, intr)
            for k, v in ps.items():
                projs.setdefault(k, []).append(v)
            dvals.append(dataset.depth_values_of(depth_min))

        self._arrs = {
            "imgs": jnp.asarray(imgs),
            "depth": {k: jnp.asarray(v) for k, v in depth.items()},
            "mask": {k: jnp.asarray(v) for k, v in mask.items()},
            "projs": {k: jnp.asarray(np.stack(v)) for k, v in projs.items()},
            "depth_values": jnp.asarray(np.stack(dvals), jnp.float32),
        }
        jax.block_until_ready(self._arrs["imgs"])

        def gather(arrs, img_rows, proj_rows, gt_rows):
            return {
                "imgs": arrs["imgs"][img_rows].astype(jnp.float32) / 255.0,
                "proj_matrices": {k: v[proj_rows]
                                  for k, v in arrs["projs"].items()},
                "depth": {k: v[gt_rows] for k, v in arrs["depth"].items()},
                "mask": {k: v[gt_rows].astype(jnp.float32)
                         for k, v in arrs["mask"].items()},
                "depth_values": arrs["depth_values"][proj_rows[:, 0]],
            }

        self._gather = jax.jit(gather)

    @staticmethod
    def _img_path_of(dataset, scan, light, vid):
        import os
        return os.path.join(
            dataset.datapath,
            f"Rectified/{scan}_train/rect_{vid + 1:03d}_{light}_r5000.png")

    def nbytes(self):
        import jax
        return sum(x.nbytes for x in jax.tree.leaves(self._arrs))

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        ds = self.dataset
        order = np.arange(len(ds.metas))
        rng = np.random.default_rng(self.seed + self._epoch)
        if self.shuffle:
            rng.shuffle(order)
        self._epoch += 1
        nb = len(self)
        for bi in range(nb):
            sel = order[bi * self.batch_size:(bi + 1) * self.batch_size]
            img_rows = np.zeros((len(sel), ds.nviews), np.int32)
            proj_rows = np.zeros((len(sel), ds.nviews), np.int32)
            gt_rows = np.zeros((len(sel),), np.int32)
            for r, mi in enumerate(sel):
                scan, light, ref, srcs = ds.metas[mi]
                if ds.mode == "train":
                    src_ids = list(rng.choice(len(srcs), ds.nviews - 1,
                                              replace=False))
                    view_ids = [ref] + [srcs[j] for j in src_ids]
                else:
                    view_ids = [ref] + list(srcs[:ds.nviews - 1])
                for v, vid in enumerate(view_ids):
                    img_rows[r, v] = self._img_keys[(scan, light, vid)]
                    proj_rows[r, v] = self._vid_row[vid]
                gt_rows[r] = self._gt_keys[(scan, ref)]
            yield self._gather(self._arrs, img_rows, proj_rows, gt_rows)
