"""ctypes bindings for the native host-side kernels (C++).

Auto-builds ``liblisec_native.so`` with ``make`` on first import if the
shared object is missing (g++ is part of the image; no pybind11, so the
ABI is plain C + ctypes). Every entry point has a numpy fallback, so
the framework degrades gracefully where no compiler exists —
``native.AVAILABLE`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "liblisec_native.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    lib.ln_read_velodyne.restype = ctypes.c_long
    lib.ln_read_velodyne.argtypes = [ctypes.c_char_p, f32p, ctypes.c_long]
    lib.ln_transform.restype = None
    lib.ln_transform.argtypes = [f32p, ctypes.c_long, ctypes.c_long,
                                 f32p, ctypes.c_float, f32p]
    lib.ln_flip_y.restype = None
    lib.ln_flip_y.argtypes = [f32p, ctypes.c_long, ctypes.c_long]
    lib.ln_points_in_rbbox_first.restype = None
    lib.ln_points_in_rbbox_first.argtypes = [
        f32p, ctypes.c_long, ctypes.c_long, f32p, ctypes.c_long, i32p]
    lib.ln_perturb_boxes.restype = None
    lib.ln_perturb_boxes.argtypes = [
        f32p, ctypes.c_long, ctypes.c_long, i32p, f32p, f32p, f32p,
        ctypes.c_long]
    lib.ln_pad_points.restype = None
    lib.ln_pad_points.argtypes = [f32p, ctypes.c_long, ctypes.c_long,
                                  f32p, u8p, ctypes.c_long]
    lib.ln_crop_range.restype = ctypes.c_long
    lib.ln_crop_range.argtypes = [f32p, ctypes.c_long, ctypes.c_long,
                                  f32p, f32p]
    return lib


_lib = _load()
AVAILABLE = _lib is not None


def _check_inplace(a: np.ndarray, dtype, name: str) -> None:
    """In-place entry points write through raw pointers: a wrong dtype
    or non-contiguous (sliced) array would be silently misread or
    corrupted, so fail loudly instead (the numpy fallbacks handle those
    inputs fine, but the behavior must not depend on AVAILABLE)."""
    if a.dtype != dtype:
        raise TypeError(f"{name}: expected {np.dtype(dtype).name} array, "
                        f"got {a.dtype.name}")
    if not a.flags.c_contiguous:
        raise ValueError(f"{name}: array must be C-contiguous "
                         "(pass a copy, not a slice/view)")


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _up(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def read_velodyne(path: str, max_points: int = 300_000) -> np.ndarray:
    """Fast KITTI .bin reader -> (N, 4) float32."""
    if _lib is None:
        return np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    buf = np.empty((max_points, 4), np.float32)
    n = _lib.ln_read_velodyne(path.encode(), _fp(buf), max_points)
    if n < 0:
        raise IOError(f"cannot read {path!r}")
    return buf[:n]


def transform_cloud(points: np.ndarray, rotation: np.ndarray,
                    scale: float, translation: np.ndarray) -> None:
    """In-place xyz <- R @ xyz * scale + t. points: (N, C) float32."""
    _check_inplace(points, np.float32, "transform_cloud")
    if _lib is None:
        points[:, :3] = (points[:, :3] @ np.asarray(
            rotation, np.float32).T) * scale + translation
        return
    rot = np.ascontiguousarray(rotation, np.float32)
    t = np.ascontiguousarray(translation, np.float32)
    _lib.ln_transform(_fp(points), len(points), points.shape[1],
                      _fp(rot), ctypes.c_float(scale), _fp(t))


def flip_y(points: np.ndarray) -> None:
    _check_inplace(points, np.float32, "flip_y")
    if _lib is None:
        points[:, 1] = -points[:, 1]
        return
    _lib.ln_flip_y(_fp(points), len(points), points.shape[1])


def points_in_rbbox_first(points: np.ndarray,
                          boxes: np.ndarray) -> np.ndarray:
    """(N,) int32: 1-based index of the first containing box, 0 = none."""
    _check_inplace(points, np.float32, "points_in_rbbox_first")
    n = len(points)
    if _lib is None or len(boxes) == 0:
        out = np.zeros(n, np.int32)
        for j, b in enumerate(boxes):
            d = points[:, :3] - b[:3]
            c, s = np.cos(b[6]), np.sin(b[6])
            lx = d[:, 0] * c + d[:, 1] * s
            ly = -d[:, 0] * s + d[:, 1] * c
            m = ((np.abs(lx) <= b[3] / 2) & (np.abs(ly) <= b[4] / 2)
                 & (np.abs(d[:, 2]) <= b[5] / 2) & (out == 0))
            out[m] = j + 1
        return out
    out = np.empty(n, np.int32)
    bx = np.ascontiguousarray(boxes, np.float32)
    _lib.ln_points_in_rbbox_first(_fp(points), n, points.shape[1],
                                  _fp(bx), len(boxes), _ip(out))
    return out


def perturb_boxes(points: np.ndarray, member: np.ndarray,
                  centers: np.ndarray, dyaw: np.ndarray,
                  dtrans: np.ndarray) -> None:
    """In-place per-box rigid noise on member points (D5)."""
    _check_inplace(points, np.float32, "perturb_boxes")
    _check_inplace(member, np.int32, "perturb_boxes(member)")
    if _lib is None:
        for j in range(len(centers)):
            m = member == j + 1
            c, s = np.cos(dyaw[j]), np.sin(dyaw[j])
            local = points[m, :2] - centers[j, :2]
            points[m, 0] = (centers[j, 0] + local[:, 0] * c
                            - local[:, 1] * s + dtrans[j, 0])
            points[m, 1] = (centers[j, 1] + local[:, 0] * s
                            + local[:, 1] * c + dtrans[j, 1])
            points[m, 2] += dtrans[j, 2]
        return
    ctr = np.ascontiguousarray(centers, np.float32)
    dy = np.ascontiguousarray(dyaw, np.float32)
    dt = np.ascontiguousarray(dtrans, np.float32)
    _lib.ln_perturb_boxes(_fp(points), len(points), points.shape[1],
                          _ip(member), _fp(ctr), _fp(dy), _fp(dt),
                          len(centers))


def pad_points(cloud: np.ndarray, max_points: int
               ) -> Tuple[np.ndarray, np.ndarray]:
    """(cloud (N, C)) -> padded (max_points, C) + bool mask."""
    cloud = np.ascontiguousarray(cloud, np.float32)
    if _lib is None:
        n = min(len(cloud), max_points)
        out = np.zeros((max_points, cloud.shape[1]), np.float32)
        out[:n] = cloud[:n]
        mask = np.zeros(max_points, np.uint8)
        mask[:n] = 1
        return out, mask.astype(bool)
    out = np.empty((max_points, cloud.shape[1]), np.float32)
    mask = np.empty(max_points, np.uint8)
    _lib.ln_pad_points(_fp(cloud), len(cloud), cloud.shape[1],
                       _fp(out), _up(mask), max_points)
    return out, mask.astype(bool)


def crop_range(points: np.ndarray, lo, hi) -> np.ndarray:
    """Return the subset of points inside [lo, hi) on xyz."""
    if _lib is None:
        m = np.all((points[:, :3] >= lo) & (points[:, :3] < hi), axis=1)
        return points[m]
    pts = np.ascontiguousarray(points, np.float32)
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    n = _lib.ln_crop_range(_fp(pts), len(pts), pts.shape[1], _fp(lo),
                           _fp(hi))
    return pts[:n]
