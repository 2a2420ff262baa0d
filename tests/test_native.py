"""Native (C++) data-plane library: build + parity with the Python paths.

The native library is the preferred implementation for PFM IO, resize and
PLY writing (effi_mvs_plus_tpu/native/src/effi_native.cc); these tests pin
its behaviour against the pure-numpy fallbacks and against cv2's
INTER_LINEAR/INTER_NEAREST semantics (the reference's preprocessing,
/root/reference/datasets/dtu_yao.py:76-125).
"""

import numpy as np
import pytest

from effi_mvs_plus_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library failed to build")


def _py_read_pfm(path):
    """The pure-python fallback, bypassing the native fast path."""
    import re
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        color = header == b"PF"
        m = re.match(rb"^(\d+)\s(\d+)\s$", f.readline())
        width, height = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.frombuffer(f.read(), endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return (np.ascontiguousarray(np.flipud(data.reshape(shape))).astype(
        np.float32), abs(scale))


@pytest.mark.parametrize("shape", [(37, 53), (16, 24, 3)])
def test_pfm_roundtrip_native(tmp_path, shape):
    rng = np.random.default_rng(0)
    img = rng.normal(size=shape).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    assert native.pfm_write(p, img)
    out, scale = native.pfm_read(p)
    np.testing.assert_array_equal(out, img)
    assert scale == 1.0
    # the python reader agrees bit-for-bit with the native writer
    out_py, scale_py = _py_read_pfm(p)
    np.testing.assert_array_equal(out_py, img)


def test_pfm_native_reads_python_written_big_endian(tmp_path):
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = str(tmp_path / "be.pfm")
    with open(p, "wb") as f:
        f.write(b"Pf\n4 3\n1.0\n")            # positive scale = big endian
        np.flipud(img).astype(">f4").tofile(f)
    out, scale = native.pfm_read(p)
    np.testing.assert_array_equal(out, img)
    assert scale == 1.0


@pytest.mark.parametrize("nearest", [False, True])
@pytest.mark.parametrize("src,dst", [((64, 96), (32, 48)),
                                     ((51, 77), (64, 96)),
                                     ((512, 640), (256, 320))])
def test_resize_matches_cv2(src, dst, nearest):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    for ch in (None, 3):
        shape = src if ch is None else (*src, ch)
        img = rng.uniform(0, 1, shape).astype(np.float32)
        ours = native.resize(img, (dst[1], dst[0]), nearest=nearest)
        interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
        ref = cv2.resize(img, (dst[1], dst[0]), interpolation=interp)
        np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_ply_write_native_matches_reader(tmp_path):
    from effi_mvs_plus_tpu.fuse.ply import read_ply
    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(1000, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (1000, 3), dtype=np.uint8)
    p = str(tmp_path / "pts.ply")
    assert native.ply_write(p, xyz, rgb)
    rx, rr = read_ply(p)
    np.testing.assert_array_equal(rx, xyz)
    np.testing.assert_array_equal(rr, rgb)
