"""Camera-file and pair-file codecs (MVSNet text formats).

Format (reference readers datasets/general_eval.py:60-80,
dtu_yao.py:57-68): line 0 'extrinsic', lines 1-4 the 4x4 world->cam
matrix, line 6 'intrinsic', lines 7-9 the 3x3 K, line 11
``depth_min depth_interval [num_depth depth_max]``.
Pair files: first line = number of views, then per view two lines:
ref id, then ``num_src src0 score0 src1 score1 ...``.
"""

from __future__ import annotations

import numpy as np


def read_cam_file(path):
    """Returns dict with extrinsics (4,4), intrinsics (3,3) and the raw
    depth line fields [depth_min, interval, (num_depth, depth_max)...]."""
    with open(path) as f:
        lines = [ln.rstrip() for ln in f.readlines()]
    extrinsics = np.fromstring(" ".join(lines[1:5]), dtype=np.float32,
                               sep=" ").reshape(4, 4)
    intrinsics = np.fromstring(" ".join(lines[7:10]), dtype=np.float32,
                               sep=" ").reshape(3, 3)
    depth_fields = [float(x) for x in lines[11].split()] if len(lines) > 11 \
        and lines[11].strip() else []
    return {"extrinsics": extrinsics, "intrinsics": intrinsics,
            "depth_fields": depth_fields}


def write_cam_file(path, extrinsics, intrinsics, depth_fields):
    with open(path, "w") as f:
        f.write("extrinsic\n")
        for row in np.asarray(extrinsics):
            f.write(" ".join(str(float(v)) for v in row) + "\n")
        f.write("\nintrinsic\n")
        for row in np.asarray(intrinsics):
            f.write(" ".join(str(float(v)) for v in row) + "\n")
        f.write("\n" + " ".join(str(float(v)) for v in depth_fields) + "\n")


def read_pair_file(path):
    """Returns list of (ref_view, [src_views]) with scores dropped."""
    pairs = []
    with open(path) as f:
        num = int(f.readline())
        for _ in range(num):
            ref = int(f.readline().rstrip())
            toks = f.readline().rstrip().split()
            srcs = [int(x) for x in toks[1::2]]
            pairs.append((ref, srcs))
    return pairs


def stage_proj_matrices(extrinsics, intrinsics, scales=(0.25, 0.5, 1.0, 2.0, 4.0)):
    """Build the per-stage (2,4,4) stacks: slot 0 extrinsics, slot 1 K with
    rows 0-1 scaled per pyramid stage (contract: SURVEY §3.5, reference
    dtu_yao.py:189-206).  `intrinsics` must already be at the stage2
    baseline resolution (quarter of full)."""
    base = np.zeros((2, 4, 4), dtype=np.float32)
    base[0] = extrinsics
    base[1, :3, :3] = intrinsics
    out = {}
    for i, s in enumerate(scales):
        m = base.copy()
        m[1, :2, :] *= s
        out[f"stage{i}"] = m
    return out


def inverse_depth_values(depth_min, depth_interval, ndepth,
                         disp_max_first=False):
    """The (Nd,) inverse-depth sample vector the model consumes
    (reference dtu_yao.py:171-178): linspace between 1/depth_max and
    1/depth_min; deployed config orders ascending (dispmaxfirst='last')."""
    depth_max = depth_interval * ndepth + depth_min
    lo, hi = 1.0 / depth_max, 1.0 / depth_min
    if disp_max_first:
        return np.linspace(hi, lo, ndepth, dtype=np.float32)
    return np.linspace(lo, hi, ndepth, dtype=np.float32)
