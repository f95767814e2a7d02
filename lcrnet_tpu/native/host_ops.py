"""ctypes bindings for the native host ops (libhost_ops.so)."""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_LIB_PATH = osp.join(_DIR, "libhost_ops.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not osp.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        osp.join(_DIR, "host_ops.cpp")
    ):
        try:
            subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.grid_subsample.restype = ctypes.c_int64
    lib.grid_subsample.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.radius_neighbors.restype = None
    lib.radius_neighbors.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.load_kitti_bin.restype = ctypes.c_int64
    lib.load_kitti_bin.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def grid_subsample_native(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Voxel-barycenter subsample (native; numpy fallback)."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    if lib is None:
        from lcrnet_tpu.data.kitti import voxel_downsample

        return voxel_downsample(points, voxel_size)
    out = np.empty_like(points)
    m = lib.grid_subsample(_fptr(points), len(points), voxel_size, _fptr(out), len(points))
    return out[:m].copy()


def radius_neighbors_native(
    q_points: np.ndarray, s_points: np.ndarray, radius: float, limit: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Cell-list radius neighbors: ((nq, limit) int32 idx with -1 pad,
    (nq,) counts), nearest first."""
    lib = _load()
    q = np.ascontiguousarray(q_points, np.float32)
    s = np.ascontiguousarray(s_points, np.float32)
    idx = np.empty((len(q), limit), np.int32)
    counts = np.empty((len(q),), np.int32)
    if lib is None:
        d2 = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)
        idx.fill(-1)
        for i in range(len(q)):
            within = np.nonzero(d2[i] <= radius * radius)[0]
            order = within[np.argsort(d2[i][within], kind="stable")][:limit]
            idx[i, : len(order)] = order
            counts[i] = len(order)
        return idx, counts
    lib.radius_neighbors(_fptr(q), len(q), _fptr(s), len(s), radius, limit, _iptr(idx), _iptr(counts))
    return idx, counts


def load_kitti_bin_native(path: str, max_points: int = 200000) -> Optional[np.ndarray]:
    """Raw velodyne .bin -> (n, 3) float32 xyz; None on IO error."""
    lib = _load()
    if lib is None:
        try:
            pts = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
            return np.ascontiguousarray(pts[:, :3])
        except OSError:
            return None
    out = np.empty((max_points, 3), np.float32)
    n = lib.load_kitti_bin(path.encode(), _fptr(out), max_points)
    if n < 0:
        return None
    return out[:n].copy()
