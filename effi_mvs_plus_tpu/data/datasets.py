"""Dataset readers: DTU train, DTU/generic eval, BlendedMVS, Tanks&Temples.

Numpy-producing readers (channels-last images) replicating the reference
preprocessing exactly — crop/resize rules, intrinsics rescaling, GT pyramid
construction, inverse-depth sample vectors:

* DTUTrainDataset     — /root/reference/datasets/dtu_yao.py
* GeneralEvalDataset  — /root/reference/datasets/general_eval.py
* BlendedMVSDataset   — /root/reference/datasets/blend.py
* TanksDataset        — /root/reference/datasets/tank.py

Each ``__getitem__`` returns a dict:
  imgs            (V, H, W, 3) float32 in [0,1]
  proj_matrices   {'stage0'..'stage4': (V, 2, 4, 4)}
  depth_values    (Nd,) ascending inverse depths
  [depth, mask]   {'stage1'..'stage4': (h, w)}        (training sets)
  filename        output-path template
"""

from __future__ import annotations

import os
import random
from typing import Optional, Sequence

import numpy as np

from effi_mvs_plus_tpu.data import cams as camio
from effi_mvs_plus_tpu.data.pfm import read_pfm


def _imread(path):
    from PIL import Image
    return np.array(Image.open(path), dtype=np.float32) / 255.0


def _resize(img, wh, nearest=False):
    from effi_mvs_plus_tpu import native
    if native.available():
        out = native.resize(np.asarray(img, np.float32), wh, nearest=nearest)
        if out is not None:
            return out
    import cv2
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    return cv2.resize(np.asarray(img, np.float32), wh, interpolation=interp)


def _gt_pyramid(arr):
    """GT depth/mask at stages 1..4 via nearest resize (dtu_yao.py:93-125)."""
    h, w = arr.shape
    return {
        "stage1": _resize(arr, (w // 8, h // 8), nearest=True),
        "stage2": _resize(arr, (w // 4, h // 4), nearest=True),
        "stage3": _resize(arr, (w // 2, h // 2), nearest=True),
        "stage4": arr,
    }


def _read_scan_list(listfile):
    if isinstance(listfile, (list, tuple)):
        return list(listfile)
    with open(listfile) as f:
        return [ln.rstrip() for ln in f if ln.strip()]


class DTUTrainDataset:
    """Yao Yao's preprocessed DTU training set.

    Metas = scans x 49 ref views x 7 light conditions (train) / light 3
    (val/test).  Images are the 640x512 rectified crops; GT depth read at
    1600x1200 then half-scaled + centre-cropped to 640x512
    (dtu_yao.py:76-91); depth-range vector from the cam file with interval
    2.5 * 1.06/(ndepths/192).
    """

    def __init__(self, datapath, listfile, mode, nviews, ndepths=384,
                 disp_max_first=False, rng=None, crop_wh=(640, 512)):
        assert mode in ("train", "val", "test")
        self.datapath = datapath
        self.mode = mode
        self.nviews = nviews
        self.ndepths = ndepths
        self.interval_scale = 1.06 / (float(ndepths) / 192.0)
        self.disp_max_first = disp_max_first
        self.rng = rng or random.Random(0)
        self.crop_wh = crop_wh   # (640, 512) = the reference rect crops
        self.metas = []
        pair = camio.read_pair_file(
            os.path.join(datapath, "Cameras/pair.txt"))
        for scan in _read_scan_list(listfile):
            for ref, srcs in pair:
                lights = range(7) if mode == "train" else [3]
                for light in lights:
                    self.metas.append((scan, light, ref, srcs))

    def __len__(self):
        return len(self.metas)

    # ---- path builders + load recipes: the single source of truth ----
    # (device_cache.DeviceCacheLoader assembles batches from these same
    # methods, so cached and streamed batches cannot desynchronise.)

    def image_path(self, scan, light, vid):
        return os.path.join(
            self.datapath,
            f"Rectified/{scan}_train/rect_{vid + 1:03d}_{light}_r5000.png")

    def cam_path(self, vid):
        return os.path.join(self.datapath, f"Cameras/train/{vid:08d}_cam.txt")

    def mask_path(self, scan, vid):
        return os.path.join(self.datapath,
                            f"Depths_raw/{scan}/depth_visual_{vid:04d}.png")

    def depth_path(self, scan, vid):
        return os.path.join(self.datapath,
                            f"Depths_raw/{scan}/depth_map_{vid:04d}.pfm")

    def _crop_offset(self, hw):
        """Centre-crop offset (sh, sw) taking an (h, w) image to crop_wh.
        Zero when the image is already crop-sized (the reference's 640x512
        rectified crops, or a tree rendered at crop_wh)."""
        h, w = hw
        tw, th = self.crop_wh
        if (w, h) == (tw, th):
            return 0, 0
        if w < tw or h < th:
            raise ValueError(
                f"images are {w}x{h} but crop_wh={self.crop_wh} — the crop "
                "must not exceed the image")
        return (h - th) // 2, (w - tw) // 2

    def crop_image(self, img):
        """Centre-crop an (H, W[, C]) image to crop_wh (no-op if sized)."""
        sh, sw = self._crop_offset(img.shape[:2])
        tw, th = self.crop_wh
        return img[sh:sh + th, sw:sw + tw]

    def camera(self, vid, image_hw):
        """Cam file -> (extrinsics, intrinsics, depth_min) with the
        principal point shifted for the centre crop applied to an image
        of native size image_hw (identity for crop-sized images).  DTU
        cam files carry QUARTER-resolution intrinsics (dtu_yao.py:57-68),
        so the full-res pixel offset is divided by 4."""
        cam = camio.read_cam_file(self.cam_path(vid))
        intr = cam["intrinsics"]
        sh, sw = self._crop_offset(image_hw)
        if sh or sw:
            intr = intr.copy()
            intr[0, 2] -= sw / 4.0
            intr[1, 2] -= sh / 4.0
        return cam["extrinsics"], intr, cam["depth_fields"][0]

    def depth_values_of(self, depth_min):
        return camio.inverse_depth_values(
            depth_min, 2.5 * self.interval_scale, self.ndepths,
            self.disp_max_first)

    def load_gt_pyramids(self, scan, vid):
        """(depth_ms, mask_ms) stage1..4 pyramids: raw GT half-scaled then
        centre-cropped to crop_wh (dtu_yao.py:93-125; >10/255 mask rule)."""
        mask_hr = (np.array(_imread(self.mask_path(scan, vid)) * 255.0)
                   > 10).astype(np.float32)
        depth_hr = read_pfm(self.depth_path(scan, vid))[0]
        return (_gt_pyramid(self._prepare_hr(depth_hr)),
                _gt_pyramid(self._prepare_hr(mask_hr)))

    def _prepare_hr(self, hr):
        h, w = hr.shape
        ds = _resize(hr, (w // 2, h // 2), nearest=True)
        h, w = ds.shape
        tw, th = self.crop_wh
        sh, sw = (h - th) // 2, (w - tw) // 2
        return ds[sh:sh + th, sw:sw + tw]

    def __getitem__(self, idx):
        scan, light, ref, srcs = self.metas[idx]
        if self.mode == "train":
            src_ids = self.rng.sample(srcs, self.nviews - 1)
        else:
            src_ids = srcs[:self.nviews - 1]
        view_ids = [ref] + src_ids

        imgs, projs = [], []
        depth_values = depth_ms = mask_ms = None
        for i, vid in enumerate(view_ids):
            img = _imread(self.image_path(scan, light, vid))
            native_hw = img.shape[:2]
            img = self.crop_image(img)
            ext, intr, depth_min = self.camera(vid, native_hw)
            projs.append(camio.stage_proj_matrices(ext, intr))
            imgs.append(img)
            if i == 0:
                depth_values = self.depth_values_of(depth_min)
                depth_ms, mask_ms = self.load_gt_pyramids(scan, vid)

        return {
            "imgs": np.stack(imgs).astype(np.float32),
            "proj_matrices": {k: np.stack([p[k] for p in projs])
                              for k in projs[0]},
            "depth": depth_ms,
            "mask": mask_ms,
            "depth_values": depth_values,
            "filename": scan + "/{}/" + f"{view_ids[0]:08d}" + "{}",
        }


class GeneralEvalDataset:
    """File-list-driven eval reader (DTU testing layout).

    Cam-file intrinsics are full-resolution and divided by 4 at load
    (general_eval.py:68); images resized to the max_h x max_w budget
    snapped down to multiples of 32 with intrinsics rescale; per-scene
    consistent sizing via fix_res/fix_wh.
    """

    def __init__(self, datapath, listfile, nviews, ndepths=384,
                 interval_scale=1.06, max_h=1184, max_w=1600,
                 fix_res=False, disp_max_first=False):
        self.datapath = datapath
        self.nviews = nviews
        self.ndepths = ndepths
        self.interval_scale = interval_scale
        self.max_h, self.max_w = max_h, max_w
        self.fix_res = fix_res
        self.fix_wh = False
        self.disp_max_first = disp_max_first
        self._s_hw = None
        self.metas = []
        for scan in _read_scan_list(listfile):
            for ref, srcs in camio.read_pair_file(
                    os.path.join(datapath, scan, "pair.txt")):
                if len(srcs) > 0:
                    if len(srcs) < nviews:
                        srcs = srcs + [srcs[0]] * (nviews - len(srcs))
                    self.metas.append((scan, ref, srcs))

    def __len__(self):
        return len(self.metas)

    def _read_cam(self, path):
        cam = camio.read_cam_file(path)
        intr = cam["intrinsics"].copy()
        intr[:2, :] /= 4.0
        fields = cam["depth_fields"]
        depth_min = fields[0]
        depth_interval = 2.5
        if len(fields) >= 3:
            depth_max = depth_min + int(fields[2]) * depth_interval
            depth_interval = (depth_max - depth_min) / self.ndepths
        depth_interval *= self.interval_scale
        return cam["extrinsics"], intr, depth_min, depth_interval

    def _scale_input(self, img, intr, base=32):
        h, w = img.shape[:2]
        new_w = int((1.0 * self.max_w / w * w) // base * base)
        new_h = int((1.0 * self.max_h / h * h) // base * base)
        intr = intr.copy()
        intr[0, :] *= 1.0 * new_w / w
        intr[1, :] *= 1.0 * new_h / h
        return _resize(img, (new_w, new_h)), intr

    def __getitem__(self, idx):
        scan, ref, srcs = self.metas[idx]
        view_ids = [ref] + srcs[:self.nviews - 1]
        imgs, projs = [], []
        depth_values = None
        for i, vid in enumerate(view_ids):
            img_path = os.path.join(self.datapath, scan,
                                    f"images_post/{vid:08d}.jpg")
            if not os.path.exists(img_path):
                img_path = os.path.join(self.datapath, scan,
                                        f"images/{vid:08d}.jpg")
            img = _imread(img_path)
            ext, intr, dmin, dint = self._read_cam(os.path.join(
                self.datapath, scan, f"cams/{vid:08d}_cam.txt"))
            img, intr = self._scale_input(img, intr)

            if self.fix_res:
                self._s_hw = img.shape[:2]
                self.fix_res = False
                self.fix_wh = True
            if i == 0 and not self.fix_wh:
                self._s_hw = img.shape[:2]
            s_h, s_w = self._s_hw
            c_h, c_w = img.shape[:2]
            if (c_h, c_w) != (s_h, s_w):
                intr[0, :] *= 1.0 * s_w / c_w
                intr[1, :] *= 1.0 * s_h / c_h
                img = _resize(img, (s_w, s_h))

            imgs.append(img)
            projs.append(camio.stage_proj_matrices(ext, intr))
            if i == 0:
                depth_values = camio.inverse_depth_values(
                    dmin, dint, self.ndepths, self.disp_max_first)

        return {
            "imgs": np.stack(imgs).astype(np.float32),
            "proj_matrices": {k: np.stack([p[k] for p in projs])
                              for k in projs[0]},
            "depth_values": depth_values,
            "filename": scan + "/{}/" + f"{view_ids[0]:08d}" + "{}",
        }


class BlendedMVSDataset:
    """BlendedMVS low-res fine-tuning reader (blend.py).

    Pair file per scan; refs with <7 src views skipped; cam line 11 yields
    [depth_min, interval, num, depth_max]; inverse-depth linspace with
    endpoint=False; masks = GT inside [depth_min, depth_max]; intrinsics
    pre-divided for stages by /16../1 relative to the 768x576 images.
    """

    def __init__(self, datapath, listfile, mode, nviews, ndepths=384,
                 disp_max_first=False, rng=None):
        self.datapath = datapath
        self.mode = mode
        self.nviews = nviews
        self.ndepths = ndepths
        self.disp_max_first = disp_max_first
        self.rng = rng or random.Random(0)
        self.metas = []
        for scan in _read_scan_list(listfile):
            pair_path = os.path.join(datapath, scan, "cams", "pair.txt")
            for ref, srcs in camio.read_pair_file(pair_path):
                # reference blend.py:48-64 drops refs with <7 sources
                if len(srcs) >= 7:
                    self.metas.append((scan, ref, srcs))

    def __len__(self):
        return len(self.metas)

    def __getitem__(self, idx):
        scan, ref, srcs = self.metas[idx]
        # the reference's random.sample branch requires mode=="finetune",
        # which its driver never passes (train.py:490 hardcodes "train")
        # — deployed blend training uses the FIRST nviews-1 sources
        # deterministically (blend.py:143-147)
        if self.mode == "finetune":
            src_ids = self.rng.sample(srcs, self.nviews - 1)
        else:
            src_ids = srcs[:self.nviews - 1]
        view_ids = [ref] + src_ids

        imgs, projs = [], []
        depth_values = depth_ms = mask_ms = None
        for i, vid in enumerate(view_ids):
            img = _imread(os.path.join(
                self.datapath, scan, f"blended_images/{vid:08d}.jpg"))
            cam = camio.read_cam_file(os.path.join(
                self.datapath, scan, f"cams/{vid:08d}_cam.txt"))
            intr = cam["intrinsics"].copy()
            intr[:2, :] /= 4.0     # stage2 baseline = quarter res
            projs.append(camio.stage_proj_matrices(cam["extrinsics"], intr))
            imgs.append(img)
            if i == 0:
                fields = cam["depth_fields"]
                depth_min, depth_max = fields[0], fields[-1]
                lo, hi = 1.0 / depth_max, 1.0 / depth_min
                if self.disp_max_first:
                    depth_values = np.linspace(
                        hi, lo, self.ndepths, endpoint=False,
                        dtype=np.float32)
                else:
                    depth_values = np.linspace(
                        lo, hi, self.ndepths, endpoint=False,
                        dtype=np.float32)
                depth = read_pfm(os.path.join(
                    self.datapath, scan,
                    f"rendered_depth_maps/{vid:08d}.pfm"))[0]
                mask = ((depth >= depth_min) & (depth <= depth_max)
                        ).astype(np.float32)
                depth_ms = _gt_pyramid(depth)
                mask_ms = _gt_pyramid(mask)

        return {
            "imgs": np.stack(imgs).astype(np.float32),
            "proj_matrices": {k: np.stack([p[k] for p in projs])
                              for k in projs[0]},
            "depth": depth_ms,
            "mask": mask_ms,
            "depth_values": depth_values,
            "filename": scan + "/{}/" + f"{view_ids[0]:08d}" + "{}",
        }


# Native resolutions of the T&T scenes (reference tank.py:33-49).
TANK_SCENE_INFO = {
    "Family": (1920, 1080), "Francis": (1920, 1080), "Horse": (1920, 1080),
    "Lighthouse": (2048, 1080), "M60": (2048, 1080), "Panther": (2048, 1080),
    "Playground": (1920, 1080), "Train": (1920, 1080),
    "Auditorium": (1920, 1080), "Ballroom": (1920, 1080),
    "Courtroom": (1920, 1080), "Museum": (1920, 1080),
    "Palace": (1920, 1080), "Temple": (1920, 1080),
}

TANK_INTERMEDIATE = ("Family", "Francis", "Horse", "Lighthouse", "M60",
                     "Panther", "Playground", "Train")
TANK_ADVANCED = ("Auditorium", "Ballroom", "Courtroom", "Museum", "Palace",
                 "Temple")


class TanksDataset:
    """Tanks & Temples eval reader (tank.py): images resized to 1920x1056
    with intrinsics rescale; depth range from cam line 11 (4-value variant
    uses its depth_max directly)."""

    def __init__(self, datapath, scans, nviews=11, ndepths=384,
                 target_wh=(1920, 1056), disp_max_first=False):
        self.datapath = datapath
        self.nviews = nviews
        self.ndepths = ndepths
        self.target_wh = target_wh
        self.disp_max_first = disp_max_first
        self.metas = []
        for scan in scans:
            split = ("intermediate" if scan in TANK_INTERMEDIATE
                     else "advanced")
            base = os.path.join(datapath, split, scan)
            for ref, srcs in camio.read_pair_file(
                    os.path.join(base, "pair.txt")):
                if len(srcs) > 0:
                    self.metas.append((scan, split, ref, srcs))

    def __len__(self):
        return len(self.metas)

    def __getitem__(self, idx):
        scan, split, ref, srcs = self.metas[idx]
        view_ids = ([ref] + srcs)[:self.nviews]
        base = os.path.join(self.datapath, split, scan)
        tw, th = self.target_wh
        imgs, projs = [], []
        depth_values = None
        for i, vid in enumerate(view_ids):
            img = _imread(os.path.join(base, f"images/{vid:08d}.jpg"))
            # the reference reads cams_1/ for the intermediate/advanced
            # splits (tank.py:135, the long-range camera set of the
            # standard preprocessed T&T); fall back to per-scene and
            # plain cams/ layouts
            cam_dir = next(
                (d for d in ("cams_1", f"cams_{scan.lower()}", "cams")
                 if os.path.exists(os.path.join(base, d))), "cams")
            cam = camio.read_cam_file(
                os.path.join(base, cam_dir, f"{vid:08d}_cam.txt"))
            h, w = img.shape[:2]
            intr = cam["intrinsics"].copy()
            intr[0, :] *= tw / w
            intr[1, :] *= th / h
            img = _resize(img, (tw, th))
            # stage2 baseline is quarter resolution
            intr_q = intr.copy()
            intr_q[:2, :] /= 4.0
            projs.append(camio.stage_proj_matrices(cam["extrinsics"], intr_q))
            imgs.append(img)
            if i == 0:
                # reference tank.py:88-94: a 4-field line 11 is
                # [min, interval, num, max] -> max from field 3; a SHORT
                # line is [min, max] -> field 1 IS depth_max (not an
                # interval)
                fields = cam["depth_fields"]
                depth_min = fields[0]
                depth_max = fields[3] if len(fields) >= 4 else fields[1]
                lo, hi = 1.0 / depth_max, 1.0 / depth_min
                if self.disp_max_first:
                    depth_values = np.linspace(hi, lo, self.ndepths,
                                               dtype=np.float32)
                else:
                    depth_values = np.linspace(lo, hi, self.ndepths,
                                               dtype=np.float32)

        return {
            "imgs": np.stack(imgs).astype(np.float32),
            "proj_matrices": {k: np.stack([p[k] for p in projs])
                              for k in projs[0]},
            "depth_values": depth_values,
            "filename": scan + "/{}/" + f"{view_ids[0]:08d}" + "{}",
        }
