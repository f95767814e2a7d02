"""Measure the ACTUAL torch reference pipeline's scan-pairs/sec on this host.

Runs the reference's own code end-to-end on CPU — its C++ extension
(`utils.ext`, JIT-built from /root/reference/utils/extensions with this
host's compiler), its collate (`registration_collate_fn_stack_mode`:
grid_subsample + radius_search per stage on the host), and its full LCRNet
model forward (`model_family/LCRNet.py`) — on the same KITTI-00 demo pair
bench.py times for the TPU build.  Replaces the guessed
BASELINE_PAIRS_PER_SEC constant with a measurement; bench.py reads the JSON
this writes (BASELINE_MEASURED.json) when present.

The north-star target is "≥10x CPU-reference scan-pairs/sec on a single
v5e" (BASELINE.json), so the honest denominator is exactly this: the
reference on this host's CPU with all cores available.

Environment shims (none alter reference numerics):
  - easydict: 15-line re-implementation (attribute-access dict)
  - `.cuda()`: identity on this CUDA-less host
  - open3d/ipdb/np.int: import-time stubs (tests/ref_torch.py documents why)

Usage: python experiments/baseline_torch.py [--iters 5] [--skip_build]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time
import types

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
REF_ROOT = "/root/reference"
DEMO_DIR = osp.join(REF_ROOT, "demo", "data_demo")
EXT_BUILD_DIR = osp.join(REPO, "output", "ref_ext_build")

EXT_SOURCES = [  # from /root/reference/setup.py:12-18 (CPU-only sources)
    "utils/extensions/extra/cloud/cloud.cpp",
    "utils/extensions/cpu/grid_subsampling/grid_subsampling.cpp",
    "utils/extensions/cpu/grid_subsampling/grid_subsampling_cpu.cpp",
    "utils/extensions/cpu/radius_neighbors/radius_neighbors.cpp",
    "utils/extensions/cpu/radius_neighbors/radius_neighbors_cpu.cpp",
    "utils/extensions/cpu/radius_filter/radius_filter.cpp",
    "utils/extensions/pybind.cpp",
]


class EasyDict(dict):
    """Minimal easydict: attribute access mirrors item access, recursively."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        for k, v in dict(d or {}, **kwargs).items():
            self[k] = v

    def __setitem__(self, name, value):
        if isinstance(value, dict) and not isinstance(value, EasyDict):
            value = EasyDict(value)
        elif isinstance(value, (list, tuple)):
            value = type(value)(
                EasyDict(x) if isinstance(x, dict) and not isinstance(x, EasyDict) else x
                for x in value
            )
        dict.__setitem__(self, name, value)
        object.__setattr__(self, name, value)

    __setattr__ = __setitem__

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e


def install_shims() -> None:
    sys.path.insert(0, REPO)
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")
        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed

    from lcrnet_tpu.models.kernel_points import parse_ply_xyz

    if "open3d" not in sys.modules:
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

    if not hasattr(np, "int"):
        np.int = int  # removed alias, used by rpetransformer.py

    import torch

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.nn.Module.cuda = lambda self, *a, **k: self


def build_ext():
    """JIT-build the reference's utils.ext from its CPU sources.

    The sources are staged into an untracked build dir (output/ is
    gitignored) because `common/torch_helper.h` unconditionally includes
    <ATen/cuda/CUDAContext.h>, which a CPU-only torch cannot compile; the
    staged copy drops that one include (nothing in the CPU sources uses
    CUDA symbols).  Numerics are untouched — this is build plumbing for the
    baseline measurement, not shipped framework code.
    """
    import shutil

    import torch.utils.cpp_extension as cpp_ext

    src_dir = osp.join(EXT_BUILD_DIR, "src")
    for rel in EXT_SOURCES + ["utils/extensions/common/torch_helper.h"]:
        dst = osp.join(src_dir, osp.relpath(rel, "utils/extensions"))
        os.makedirs(osp.dirname(dst), exist_ok=True)
        shutil.copyfile(osp.join(REF_ROOT, rel), dst)
    # headers included relative to each .cpp
    for rel_hdr in [
        "cpu/grid_subsampling/grid_subsampling.h",
        "cpu/grid_subsampling/grid_subsampling_cpu.h",
        "cpu/radius_neighbors/radius_neighbors.h",
        "cpu/radius_neighbors/radius_neighbors_cpu.h",
        "cpu/radius_filter/radius_filter.h",
        "extra/cloud/cloud.h",
        "extra/nanoflann/nanoflann.hpp",
    ]:
        dst = osp.join(src_dir, rel_hdr)
        os.makedirs(osp.dirname(dst), exist_ok=True)
        shutil.copyfile(osp.join(REF_ROOT, "utils/extensions", rel_hdr), dst)
    helper = osp.join(src_dir, "common", "torch_helper.h")
    with open(helper) as f:
        text = f.read()
    with open(helper, "w") as f:
        f.write(text.replace("#include <ATen/cuda/CUDAContext.h>\n", ""))

    mod = cpp_ext.load(
        name="ref_utils_ext",
        sources=[
            osp.join(src_dir, osp.relpath(s, "utils/extensions"))
            for s in EXT_SOURCES
        ],
        extra_include_paths=[src_dir],
        extra_cflags=["-O3"],
        build_directory=EXT_BUILD_DIR,
        verbose=False,
    )
    sys.modules["utils.ext"] = mod
    return mod


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--out", default=osp.join(REPO, "BASELINE_MEASURED.json"))
    args = parser.parse_args()

    install_shims()
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    build_ext()

    import experiments.lcrnet.backbone4 as backbone4
    from experiments.lcrnet.config_model import make_cfg as make_cfg_model
    from experiments.lcrnet.data import (
        calibrate_neighbors_stack_mode,
        registration_collate_fn_stack_mode,
    )
    from experiments.lcrnet.model_family.LCRNet import create_model

    # the vote encoder's mid-forward radius_search returns `[:, :limit]`
    # slices (modules/ops/radius_search.py:25-27) that index_select's
    # .view(-1) cannot flatten; contiguity is value-identical (the collate
    # path gets it for free from DataLoader worker IPC)
    _orig_rs = backbone4.radius_search
    backbone4.radius_search = lambda *a, **k: _orig_rs(*a, **k).contiguous()

    cfg = make_cfg_model()
    cfg.vis = False

    pos = np.load(osp.join(DEMO_DIR, "003854.npy"))[:, :3].astype(np.float32)
    anc = np.load(osp.join(DEMO_DIR, "000958.npy"))[:, :3].astype(np.float32)
    item = {
        "ref_points": pos,
        "src_points": anc,
        "ref_feats": np.ones((pos.shape[0], 1), np.float32),
        "src_feats": np.ones((anc.shape[0], 1), np.float32),
        "transform": None,
        "pos_idx": 3854,
        "anc_idx": 958,
    }

    stages = cfg.backbone.num_stages
    voxel = cfg.backbone.init_voxel_size
    radius = cfg.backbone.init_radius

    t0 = time.perf_counter()
    neighbor_limits = calibrate_neighbors_stack_mode(
        [item], registration_collate_fn_stack_mode, stages, voxel, radius
    )
    calibrate_s = time.perf_counter() - t0
    cfg.neighbor_limits = [int(x) for x in neighbor_limits]

    model = create_model(cfg).eval()

    def _contig(obj):
        # the reference's DataLoader pushes the collated dict through worker
        # IPC, which re-serializes (hence re-contiguates) every tensor; the
        # in-process call must match, or the `[:, :limit]` neighbor slices
        # reach index_select's .view(-1) non-contiguous and crash
        if isinstance(obj, torch.Tensor):
            return obj.contiguous()
        if isinstance(obj, list):
            return [_contig(x) for x in obj]
        if isinstance(obj, dict):
            return {k: _contig(v) for k, v in obj.items()}
        return obj

    def one_pair():
        data = _contig(registration_collate_fn_stack_mode(
            [item], stages, voxel, radius, neighbor_limits
        ))
        with torch.no_grad():
            out = model(data)
        return out

    # warmup (allocator, thread pools)
    t0 = time.perf_counter()
    out = one_pair()
    warm_s = time.perf_counter() - t0
    assert np.isfinite(out["estimated_transform"].numpy()).all()

    collate_times, total_times = [], []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        data = _contig(registration_collate_fn_stack_mode(
            [item], stages, voxel, radius, neighbor_limits
        ))
        t1 = time.perf_counter()
        with torch.no_grad():
            out = model(data)
        _ = out["estimated_transform"].numpy()
        t2 = time.perf_counter()
        collate_times.append(t1 - t0)
        total_times.append(t2 - t0)

    total = float(np.mean(total_times))
    result = {
        "metric": "reference_scan_pairs_per_sec_cpu",
        "pairs_per_sec": round(1.0 / total, 4),
        "total_ms": round(total * 1e3, 1),
        "collate_ms": round(float(np.mean(collate_times)) * 1e3, 1),
        "forward_ms": round((total - float(np.mean(collate_times))) * 1e3, 1),
        "first_pair_ms": round(warm_s * 1e3, 1),
        "calibrate_s": round(calibrate_s, 1),
        "iters": args.iters,
        "torch_threads": torch.get_num_threads(),
        "neighbor_limits": cfg.neighbor_limits,
        "host_cpus": os.cpu_count(),
        "note": "reference code executed verbatim on CPU (demo KITTI-00 pair "
                "3854/958); .cuda() identity, random init weights — runtime "
                "is weight-independent",
    }
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
