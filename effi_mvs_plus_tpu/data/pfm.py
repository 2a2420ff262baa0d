"""PFM (Portable Float Map) codec.

Implements the PFM spec (header 'PF'/'Pf', dims line, scale line whose sign
encodes endianness, rows stored bottom-up) — the interchange format the
reference uses for depth/confidence maps (behavioural reference:
/root/reference/datasets/data_io.py:61-126).
"""

from __future__ import annotations

import re

import numpy as np


def read_pfm(path):
    """Returns (data (H,W) or (H,W,3) float32, scale).

    Uses the native codec (effi_mvs_plus_tpu.native) when built; the pure
    numpy path below is the always-available fallback."""
    from effi_mvs_plus_tpu import native
    if native.available():
        return native.pfm_read(path)
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError(f"{path}: not a PFM file (header {header!r})")
        dims = f.readline()
        m = re.match(rb"^(\d+)\s(\d+)\s$", dims)
        if not m:
            raise ValueError(f"{path}: malformed PFM dimensions {dims!r}")
        width, height = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.frombuffer(f.read(), endian + "f")
    shape = (height, width, 3) if color else (height, width)
    data = data.reshape(shape)
    return np.ascontiguousarray(np.flipud(data)).astype(np.float32), abs(scale)


def save_pfm(path, image, scale=1.0):
    from effi_mvs_plus_tpu import native
    if native.available() and native.pfm_write(path, image, scale):
        return
    image = np.asarray(image, dtype=np.float32)
    if image.ndim == 3 and image.shape[2] == 3:
        color = True
    elif image.ndim == 2 or (image.ndim == 3 and image.shape[2] == 1):
        color = False
        image = image.reshape(image.shape[0], image.shape[1])
    else:
        raise ValueError("PFM expects HxW or HxWx3")
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        endian = image.dtype.byteorder
        if endian == ">" or (endian == "=" and np.little_endian is False):
            f.write(f"{scale}\n".encode())
        else:
            f.write(f"{-scale}\n".encode())
        np.flipud(image).tofile(f)
