"""Deterministic kernel-point dispositions for KPConv.

Capability parity with `experiments/lcrnet/modules/kpconv/kernel_points.py`
(load_kernels + repulsion optimization), with one deliberate inversion: the
reference applies a *random* rotation and noise to the dispositions at every
model build (`kernel_points.py:428-452`), which breaks bit-reproducibility
between runs.  Here the dispositions are generated once by a seeded repulsion
optimization and cached — every model build sees identical kernel geometry.
"""

from __future__ import annotations

import struct
from functools import lru_cache
from typing import Dict, Optional

import numpy as np

# installed override dispositions, keyed by kernel size K
_OVERRIDES: Dict[int, np.ndarray] = {}


def parse_ply_xyz(path: str) -> np.ndarray:
    """Minimal PLY vertex reader (x, y, z properties only).

    Handles `format ascii 1.0` and `format binary_little_endian 1.0` with
    float32/float64 properties — enough to read the reference's shipped
    kernel dispositions (`modules/kpconv/dispositions/k_015_center_3D.ply`,
    binary little-endian float64) without open3d.
    """
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode("ascii").splitlines()
    fmt = None
    count = None
    props = []  # (name, dtype_char)
    _SIZES = {"float": "f", "float32": "f", "float64": "d", "double": "d"}
    in_vertex = False
    for line in header:
        toks = line.split()
        if not toks:
            continue
        if toks[0] == "format":
            fmt = toks[1]
        elif toks[0] == "element":
            in_vertex = toks[1] == "vertex"
            if in_vertex:
                count = int(toks[2])
        elif toks[0] == "property" and in_vertex:
            if toks[1] not in _SIZES:
                raise ValueError(f"unsupported vertex property type {toks[1]} in {path}")
            props.append((toks[2], _SIZES[toks[1]]))
    if fmt is None or count is None:
        raise ValueError(f"malformed PLY header in {path}")
    names = [p[0] for p in props]
    cols = [names.index(ax) for ax in ("x", "y", "z")]

    if fmt == "ascii":
        body = data[header_end:].decode("ascii").split()
        vals = np.array(body[: count * len(props)], dtype=np.float64)
        table = vals.reshape(count, len(props))
    elif fmt == "binary_little_endian":
        rec = struct.Struct("<" + "".join(ch for _, ch in props))
        table = np.array(
            [rec.unpack_from(data, header_end + i * rec.size) for i in range(count)],
            dtype=np.float64,
        )
    else:
        raise ValueError(f"unsupported PLY format {fmt} in {path}")
    return np.ascontiguousarray(table[:, cols], dtype=np.float32)


def set_unit_dispositions(points: Optional[np.ndarray], num_points: Optional[int] = None) -> None:
    """Install explicit unit-ball kernel dispositions for kernel size K.

    Used for checkpoint parity with the reference: the reference builds its
    kernels from `k_015_center_3D.ply` (+ a per-process random rotation and
    noise, `kernel_points.py:426-455`); installing the PLY's points here
    reproduces that checkpoint's kernel geometry deterministically (without
    the non-reproducible noise).  Pass ``None`` to clear the override.
    """
    if points is None:
        if num_points is None:
            _OVERRIDES.clear()
        else:
            _OVERRIDES.pop(int(num_points), None)
        return
    pts = np.ascontiguousarray(points, dtype=np.float32)
    if pts.ndim != 2 or pts.shape[1] != 3:
        raise ValueError(f"dispositions must be (K, 3), got {pts.shape}")
    _OVERRIDES[pts.shape[0]] = pts


def load_reference_dispositions(path: str) -> np.ndarray:
    """Parse a reference disposition PLY and install it as the override."""
    pts = parse_ply_xyz(path)
    set_unit_dispositions(pts)
    return pts


@lru_cache(maxsize=None)
def _unit_dispositions(num_points: int, seed: int = 7351, ratio: float = 0.66) -> np.ndarray:
    """K points in the unit ball: one pinned at the origin, the rest spread by
    electrostatic repulsion + weak central attraction, then rescaled so the
    mean radius of the ring points equals ``ratio`` (KPConv convention)."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, size=(num_points, 3))
    pts[0] = 0.0
    lr = 0.01
    for _ in range(2000):
        diff = pts[:, None, :] - pts[None, :, :]          # (K, K, 3)
        d2 = (diff ** 2).sum(-1) + 1e-12
        np.fill_diagonal(d2, np.inf)
        rep = (diff / (d2 ** 1.5)[..., None]).sum(axis=1)  # inverse-square push
        grad = rep - pts                                   # central pull
        grad[0] = 0.0
        norm = np.linalg.norm(grad, axis=1, keepdims=True)
        pts = pts + lr * grad / np.maximum(norm, 1e-9)
        # clip to unit ball
        r = np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
        pts = np.where(r > 1.0, pts / r, pts)
    r = np.linalg.norm(pts[1:], axis=1)
    pts[1:] *= ratio / r.mean()
    return pts.astype(np.float32)


def load_kernel_points(radius: float, num_points: int = 15) -> np.ndarray:
    """Kernel point positions (K, 3) scaled to the conv radius.

    Uses dispositions installed via `set_unit_dispositions` (e.g. parsed from
    the reference's `k_015_center_3D.ply`) when present, else the seeded
    repulsion-optimized defaults."""
    override = _OVERRIDES.get(num_points)
    unit = override if override is not None else _unit_dispositions(num_points)
    return unit * np.float32(radius)
