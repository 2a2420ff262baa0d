"""Import reference PyTorch checkpoints into the native param pytree.

The reference ships two trained checkpoints
(/root/reference/checkpoints/Effi_MVS_plus/model_{dtu,tank}.ckpt, format
``{'model': state_dict}`` per train.py:151-155).  This module re-lays the
tensors into our storage layouts:

* 2-D conv  (O,I,kh,kw)      -> (kh,kw,I,O)
* 3-D conv  (O,I,kd,kh,kw)   -> (kd,kh,kw,I,O)
* 3-D conv-transpose (I,O,kd,kh,kw) -> spatially flipped (kd,kh,kw,I,O),
  so `nn.conv_transpose3d` is a single lhs-dilated convolution.
* BN running stats kept as-is; ``num_batches_tracked`` dropped.

ModuleList aliases (``update_block.N``, ``CSP_R.N``, ``CSP_C.N``) duplicate
the canonical modules and are skipped.
"""

from __future__ import annotations

import numpy as np

# canonical transpose-convolution parameter sites
_TRANSPOSE_CONVS = {
    ("cost_regularization", "conv6"),
    ("cost_regularization", "conv7"),
    ("CSP_R1", "conv2"), ("CSP_R2", "conv2"),
    ("CSP_C1", "conv2"), ("CSP_C2", "conv2"),
}

_ALIAS_PREFIXES = ("update_block.", "CSP_R.", "CSP_C.", "GetCost",
                   "depthnet")


def _split_path(key):
    """Map a torch state_dict key onto our nested-dict path."""
    parts = key.split(".")
    top = parts[0]
    if top in ("feature", "cnet_depth"):
        if len(parts) > 2 and parts[1].startswith("conv") and parts[2].isdigit():
            return [top, f"{parts[1]}.{parts[2]}"] + parts[3:]
        return [top, parts[1]] + parts[2:]
    if top.startswith("update_block_depth"):
        if parts[1] == "mask":
            return [top, f"mask.{parts[2]}"] + parts[3:]
        return [top, parts[1], parts[2]] + parts[3:]
    if top == "PixelwiseNet":
        return [top, parts[1]] + parts[2:]
    return [top, parts[1]] + parts[2:]


def _relayout(path, arr):
    name = path[-1]
    if name != "weight" or arr.ndim < 4:
        return arr
    if arr.ndim == 4:
        return np.transpose(arr, (2, 3, 1, 0))
    # 5-D
    if (path[0], path[1]) in _TRANSPOSE_CONVS:
        w = np.transpose(arr, (2, 3, 4, 0, 1))          # (kd,kh,kw,I,O)
        return w[::-1, ::-1, ::-1].copy()
    return np.transpose(arr, (2, 3, 4, 1, 0))


def import_state_dict(sd) -> dict:
    """sd: mapping torch-name -> numpy array.  Returns the param pytree."""
    params: dict = {}
    for key, arr in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        if key.startswith(_ALIAS_PREFIXES):
            continue
        arr = np.asarray(arr, dtype=np.float32)
        path = _split_path(key)
        arr = _relayout(path, arr)
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    # group bare-conv params under the composite-layer convention:
    # nothing to do — paths already place conv/bn one level down where the
    # reference wraps them, and plain convs keep {'weight','bias'} directly.
    return params


def load_torch_checkpoint(path) -> dict:
    """Read a reference .ckpt (requires torch, CPU-only)."""
    import torch
    ck = torch.load(path, map_location="cpu", weights_only=False)
    sd = ck.get("model", ck)
    return import_state_dict({k: v.numpy() for k, v in sd.items()})


def save_npz(path_ckpt, path_npz):
    """Convert a torch .ckpt to a torch-free .npz of raw named tensors."""
    import torch
    ck = torch.load(path_ckpt, map_location="cpu", weights_only=False)
    sd = ck.get("model", ck)
    np.savez_compressed(path_npz,
                        **{k: v.numpy() for k, v in sd.items()})


def load_npz_checkpoint(path) -> dict:
    data = np.load(path)
    return import_state_dict({k: data[k] for k in data.files})
