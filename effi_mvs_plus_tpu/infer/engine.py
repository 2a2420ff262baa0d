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
                 donate=False, shard_views=False, buckets=None):
        """shard_views: on a multi-chip host, put the WHOLE device mesh on
        the model axis and shard the source-view axis — every chip
        cooperates on one depth map (FPN + per-view warps sharded, view
        reduction psummed over ICI).  The T&T deployment point (batch 1,
        11 views at 1920x1056) is the target: per-chip HBM for the
        feature stack drops ~V/n-fold (SHARDING_TANK_r02.json).

        buckets: optional list of (H, W) compilation buckets (each a
        multiple of 32, ascending area).  Per-scene native sizes
        (reference tank.py:33-49 / general_eval fix_wh) otherwise each
        pay a full XLA compile (~minutes through the relay at T&T size);
        with buckets, an input is zero-padded bottom/right to the
        smallest bucket that holds it and the outputs are cropped back —
        the pad rim is beyond every real pixel, the principal point does
        not move, and zeros match the warp's out-of-image convention, so
        real-area depths are unaffected outside a receptive-field-wide
        edge band (the same band the fusion vote already distrusts)."""
        self.params = params
        self.cfg = cfg
        self.buckets = (sorted(buckets, key=lambda hw: hw[0] * hw[1])
                        if buckets else None)
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

    def _pick_bucket(self, H, W):
        for bh, bw in self.buckets:
            if bh >= H and bw >= W:
                return bh, bw
        return None

    def _infer_device(self, batch):
        """Dispatch the forward for one batch; returns DEVICE arrays
        (depth, conf) without forcing a host sync — JAX dispatch is
        async, so the caller can overlap host work with chip compute.

        With `buckets`, the images are zero-padded bottom/right to the
        smallest bucket and the outputs cropped back, so scenes with
        different native sizes share one compiled executable."""
        crop = None
        if self.buckets is not None:
            H, W = batch["imgs"].shape[2], batch["imgs"].shape[3]
            bucket = self._pick_bucket(H, W)
            if bucket is not None and bucket != (H, W):
                bh, bw = bucket
                imgs = np.asarray(batch["imgs"])
                imgs = np.pad(imgs, ((0, 0), (0, 0), (0, bh - H),
                                     (0, bw - W), (0, 0)))
                batch = {**batch, "imgs": imgs}
                crop = (H, W)
        depth, conf = self._infer_device_raw(batch)
        if crop is not None:
            H, W = crop
            depth = depth[:, :H, :W]
            conf = conf[:, :H // 2, :W // 2]
        return depth, conf

    def _infer_device_raw(self, batch):
        projs = {k: v for k, v in batch["proj_matrices"].items()
                 if k in ("stage1", "stage2", "stage3")}
        B = batch["imgs"].shape[0]
        if self._policy is not None:
            from effi_mvs_plus_tpu.parallel import shard_batch
            put = shard_batch({"imgs": batch["imgs"], "projs": projs,
                               "dv": batch["depth_values"]},
                              self._policy.mesh)   # data axis is 1
            return self._with_policy(put["imgs"], put["projs"], put["dv"])
        if _fit_devices(B) > 1:
            from effi_mvs_plus_tpu.parallel import fit_data_mesh, shard_batch
            mesh = fit_data_mesh(B)
            put = shard_batch({"imgs": batch["imgs"], "projs": projs,
                               "dv": batch["depth_values"]}, mesh)
            return self._fn(put["imgs"], put["projs"], put["dv"])
        projs = {k: jnp.asarray(v) for k, v in projs.items()}
        return self._fn(jnp.asarray(batch["imgs"]), projs,
                        jnp.asarray(batch["depth_values"]))

    def infer_batch(self, batch):
        """batch: dict with imgs (B,V,H,W,3), proj_matrices stage dicts,
        depth_values (B,Nd).  Returns (depth (B,H,W), conf (B,H/2,W/2))
        as numpy.  On a multi-chip host the batch of reference views is
        sharded over the devices' data axis (divisibility permitting)."""
        depth, conf = self._infer_device(batch)
        return np.asarray(depth), np.asarray(conf)

    @staticmethod
    def _write_batch(outdir, batch, depth, conf):
        """Host side of one batch: sync the device handles and write
        depth_est/ confidence/ cams/ images/ per the reference layout
        (test_dtu_dypcd.py:454-478)."""
        depth = np.asarray(depth)                  # device sync happens here
        conf = np.asarray(conf)
        for b in range(depth.shape[0]):
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
            # reference-image write: the T&T fusion second pass re-reads
            # this directory (reference test_tank.py:318-387), so a failed
            # write must be LOUD, not swallowed.  Only a missing PIL is
            # tolerable (preview-quality dependency, absent in some
            # sandboxes) — and even that is logged once.
            img = (np.asarray(batch["imgs"][b, 0]) * 255).astype(np.uint8)
            try:
                from PIL import Image
            except ImportError:
                if not getattr(InferenceEngine, "_warned_no_pil", False):
                    InferenceEngine._warned_no_pil = True
                    print("WARNING: PIL unavailable — skipping images/ "
                          "writes (T&T fusion re-reads them)", flush=True)
            else:
                Image.fromarray(img).save(img_path)
        return depth.shape[0]

    def save_scene_depths(self, loader, outdir, verbose=True):
        """Run a whole eval loader, writing depth_est/ confidence/ cams/
        images/ per the reference output layout.  Returns timing stats.

        Software-pipelined: the forward for batch N+1 is dispatched (JAX
        async dispatch) while a writer thread syncs batch N's outputs and
        writes its files — chip compute and host PFM/JPG encoding
        overlap instead of alternating.  The queue bound caps in-flight
        device output buffers (depth+conf per batch is MB-scale)."""
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=2)
        state = {"maps": 0, "err": None}

        def writer():
            while True:
                item = q.get()
                if item is None:
                    return
                try:
                    wrote = self._write_batch(outdir, *item)
                    state["maps"] += wrote
                    if verbose:
                        print(f"inferred {state['maps']} maps", flush=True)
                except Exception as e:          # surface on join
                    state["err"] = e
                    return

        def put(item):
            """Bounded put that can't deadlock if the writer died."""
            while state["err"] is None:
                try:
                    q.put(item, timeout=1.0)
                    return True
                except queue.Full:
                    continue
            return False

        t0 = time.perf_counter()
        th = threading.Thread(target=writer, daemon=True)
        th.start()
        for batch in loader:
            depth, conf = self._infer_device(batch)
            if not put((batch, depth, conf)):
                break
        put(None)
        th.join()
        if state["err"] is not None:
            raise state["err"]
        total = time.perf_counter() - t0
        return {"maps": state["maps"], "total_s": total,
                "s_per_map": total / max(state["maps"], 1)}
