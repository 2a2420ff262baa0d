"""Depth-map inference engine.

Replaces the reference's save_scene_depth loop
(/root/reference/test_dtu_dypcd.py:398-485): jitted forward per (shape,
views) bucket, final depth + confidence pulled to host and written as PFM
+ cam text + preview jpg per reference view.

TPU specifics: one compiled executable per input-shape bucket (the eval
readers keep per-scene shapes constant, so in practice one or two
compiles); batches of reference views fill the chip; bf16 compute with
fp32 outputs.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from effi_mvs_plus_tpu.models import EffiMVSConfig, forward
from effi_mvs_plus_tpu.data.pfm import save_pfm
from effi_mvs_plus_tpu.data import cams as camio


def _fit_devices(batch_size):
    """Largest device count that divides the batch."""
    n = jax.device_count()
    while n > 1 and batch_size % n:
        n -= 1
    return n


class InferenceEngine:
    def __init__(self, params, cfg: EffiMVSConfig = EffiMVSConfig(),
                 donate=False, shard_views=False):
        """shard_views: on a multi-chip host, put the WHOLE device mesh on
        the model axis and shard the source-view axis — every chip
        cooperates on one depth map (FPN + per-view warps sharded, view
        reduction psummed over ICI).  The T&T deployment point (batch 1,
        11 views at 1920x1056) is the target: per-chip HBM for the
        feature stack drops ~V/n-fold (SHARDING_TANK_r02.json)."""
        self.params = params
        self.cfg = cfg
        self._fn = jax.jit(self._run)
        self._policy = None
        if shard_views and jax.device_count() > 1:
            from effi_mvs_plus_tpu.parallel import ShardingPolicy, make_mesh
            mesh = make_mesh(data=1, model=jax.device_count())
            self._policy = ShardingPolicy(mesh, shard_depth=False,
                                          shard_views=True)
            self.params = jax.tree.map(
                lambda x: jax.device_put(x, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec())), params)

    def _with_policy(self, *args):
        if self._policy is None:
            return self._fn(*args)
        from effi_mvs_plus_tpu.parallel import use_policy
        with use_policy(self._policy):   # applied at trace time
            return self._fn(*args)

    def _run(self, imgs, proj_matrices, depth_values):
        out = forward(self.params, imgs, proj_matrices, depth_values,
                      self.cfg, ctx=None)
        return (out["depth"][-1].astype(jnp.float32),
                out["photometric_confidence"].astype(jnp.float32))

    def infer_batch(self, batch):
        """batch: dict with imgs (B,V,H,W,3), proj_matrices stage dicts,
        depth_values (B,Nd).  Returns (depth (B,H,W), conf (B,H/2,W/2))
        as numpy.  On a multi-chip host the batch of reference views is
        sharded over the devices' data axis (divisibility permitting)."""
        projs = {k: v for k, v in batch["proj_matrices"].items()
                 if k in ("stage1", "stage2", "stage3")}
        B = batch["imgs"].shape[0]
        if self._policy is not None:
            from effi_mvs_plus_tpu.parallel import shard_batch
            put = shard_batch({"imgs": batch["imgs"], "projs": projs,
                               "dv": batch["depth_values"]},
                              self._policy.mesh)   # data axis is 1
            depth, conf = self._with_policy(put["imgs"], put["projs"],
                                            put["dv"])
        elif _fit_devices(B) > 1:
            from effi_mvs_plus_tpu.parallel import fit_data_mesh, shard_batch
            mesh = fit_data_mesh(B)
            put = shard_batch({"imgs": batch["imgs"], "projs": projs,
                               "dv": batch["depth_values"]}, mesh)
            depth, conf = self._fn(put["imgs"], put["projs"], put["dv"])
        else:
            projs = {k: jnp.asarray(v) for k, v in projs.items()}
            depth, conf = self._fn(jnp.asarray(batch["imgs"]), projs,
                                   jnp.asarray(batch["depth_values"]))
        return np.asarray(depth), np.asarray(conf)

    def save_scene_depths(self, loader, outdir, verbose=True):
        """Run a whole eval loader, writing depth_est/ confidence/ cams/
        images/ per the reference output layout.  Returns timing stats."""
        times = []
        n_maps = 0
        for batch in loader:
            t0 = time.perf_counter()
            depth, conf = self.infer_batch(batch)   # host numpy => synced
            dt = time.perf_counter() - t0
            times.append(dt)
            B = depth.shape[0]
            n_maps += B
            for b in range(B):
                template = batch["filename"][b]
                depth_path = os.path.join(
                    outdir, template.format("depth_est", ".pfm"))
                conf_path = os.path.join(
                    outdir, template.format("confidence", ".pfm"))
                cam_path = os.path.join(
                    outdir, template.format("cams", "_cam.txt"))
                img_path = os.path.join(
                    outdir, template.format("images", ".jpg"))
                for p in (depth_path, conf_path, cam_path, img_path):
                    os.makedirs(os.path.dirname(p), exist_ok=True)
                save_pfm(depth_path, depth[b])
                save_pfm(conf_path, conf[b])
                # full-resolution (stage4) cams for fusion
                proj = np.asarray(batch["proj_matrices"]["stage4"][b, 0])
                dv = np.asarray(batch["depth_values"][b])
                depth_min = 1.0 / float(dv.max())   # dv = ascending inverse depths
                depth_max = 1.0 / float(dv.min())
                camio.write_cam_file(
                    cam_path, proj[0], proj[1][:3, :3],
                    [depth_min, (depth_max - depth_min) / len(dv),
                     float(len(dv)), depth_max])
                img = (np.asarray(batch["imgs"][b, 0]) * 255).astype(np.uint8)
                try:
                    from PIL import Image
                    Image.fromarray(img).save(img_path)
                except Exception:
                    pass
            if verbose:
                print(f"inferred {n_maps} maps, {dt / B:.3f}s/map")
        return {"maps": n_maps, "total_s": sum(times),
                "s_per_map": sum(times) / max(n_maps, 1)}
