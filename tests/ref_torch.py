"""Import harness for the reference's own torch modules (parity tests).

The reference's neural modules are pure torch at module granularity; only
their package *imports* pull in things this host lacks (the compiled
`utils.ext` C++ extension, open3d, ipdb, pytorch_metric_learning) or that
modern numpy/CPU-only torch removed (`np.int`, `.cuda()` hops).  This module
installs the minimal shims so `tests/test_torch_parity.py` can execute the
reference modules verbatim on CPU and pin torch-vs-JAX agreement.

None of the shims alters reference numerics: the ext stub raises if ever
called (neural forwards never call it), `.cuda()` becomes the identity on a
CUDA-less host, and `np.int`/metric-learning are import-time-only touches.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"


def _fail_ext(*args, **kwargs):
    raise RuntimeError(
        "utils.ext stub called — parity tests exercise neural forwards only"
    )


def _install_stubs() -> None:
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

    if "utils.ext" not in sys.modules:
        ext = types.ModuleType("utils.ext")
        for fname in ("radius_neighbors", "grid_subsampling", "radius_filter"):
            setattr(ext, fname, _fail_ext)
        sys.modules["utils.ext"] = ext

    if "open3d" not in sys.modules:
        # functional enough for the reference's load_kernels
        # (kernel_points.py:423-424): read a disposition PLY's vertices via
        # this repo's own parser — no geometry processing involved
        from lcrnet_tpu.models.kernel_points import parse_ply_xyz

        def _read_point_cloud(path):
            return types.SimpleNamespace(points=parse_ply_xyz(path).astype(np.float64))

        o3d = types.ModuleType("open3d")
        o3d.geometry = types.SimpleNamespace()
        o3d.utility = types.SimpleNamespace()
        o3d.io = types.SimpleNamespace(read_point_cloud=_read_point_cloud)
        sys.modules["open3d"] = o3d

    if "ipdb" not in sys.modules:
        ipdb = types.ModuleType("ipdb")
        ipdb.set_trace = lambda *a, **k: None
        sys.modules["ipdb"] = ipdb

    if "easydict" not in sys.modules:
        # minimal attribute-access dict, enough for the reference's configs
        class EasyDict(dict):
            def __init__(self, d=None, **kw):
                super().__init__()
                for k, v in dict(d or {}, **kw).items():
                    self[k] = v

            def __setitem__(self, name, value):
                if isinstance(value, dict) and not isinstance(value, EasyDict):
                    value = EasyDict(value)
                dict.__setitem__(self, name, value)
                object.__setattr__(self, name, value)

            __setattr__ = __setitem__

            def __getattr__(self, name):
                try:
                    return self[name]
                except KeyError as e:
                    raise AttributeError(name) from e

        ed = types.ModuleType("easydict")
        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed

    if "pytorch_metric_learning" not in sys.modules:
        pml = types.ModuleType("pytorch_metric_learning")
        pml.distances = types.ModuleType("pytorch_metric_learning.distances")
        sys.modules["pytorch_metric_learning"] = pml
        sys.modules["pytorch_metric_learning.distances"] = pml.distances

    # the reference predates numpy 1.24's removal of the np.int alias
    # (used in rpetransformer.py's rotary embedding)
    if not hasattr(np, "int"):
        np.int = int  # noqa: NPY001

    import torch

    # the reference hops tensors to CUDA mid-math (procrustes.py:53-66,
    # learnable_sinkhorn.py:34-62); identity on a CUDA-less host
    if not torch.cuda.is_available() and not getattr(
        torch.Tensor.cuda, "_parity_patched", False
    ):
        def _cuda_noop(self, *a, **k):
            return self

        _cuda_noop._parity_patched = True
        torch.Tensor.cuda = _cuda_noop
        torch.nn.Module.cuda = lambda self, *a, **k: self


def load_ref(name: str):
    """Import a reference module by dotted path, skipping if unavailable."""
    import pytest

    pytest.importorskip("torch")
    if not os.path.isdir(REF_ROOT):
        pytest.skip("reference tree not available on this host")
    _install_stubs()
    return importlib.import_module(name)


def state_dict_numpy(module) -> dict:
    """A torch module's state_dict as {name: np.ndarray} (f32)."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
