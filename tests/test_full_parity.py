"""Full-pipeline cross-implementation parity (slow; real demo scans).

Runs `experiments/full_parity.py`'s two sides — the reference's own torch
LCRNet (with its C++ collate extension, JIT-built once into
output/ref_ext_build) and this framework's pair forward — with identical
converted weights, and asserts the agreement levels recorded in PARITY.md:

  - pyramid stage point sets: exact (counts equal, bijective match)
  - stage-4 encoder features: per-row cosine >= 0.99 after coordinate
    alignment
  - global descriptors: cosine >= 0.85 and pair-L2 within 0.02
    (the NetVLAD soft-assignment is chaotic under random weights; the
    head itself is bit-tested in test_torch_parity.py)

Skips cleanly when torch, the reference checkout, or a compiler is absent.
"""

import os
import os.path as osp
import shutil
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "experiments"))

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not osp.isdir(REF_ROOT), reason="reference checkout absent"),
    pytest.mark.skipif(shutil.which("g++") is None, reason="no compiler for the reference ext"),
]


def test_full_pipeline_parity():
    """Subprocess-isolated: executing the reference torch pipeline in-process
    (oneDNN init + torch.set_num_threads + the JIT-built C++ ext) perturbs
    XLA:CPU numerics for every LATER test in the same process — reproduced
    deterministically as test_golden's num_corr flipping 102 -> 130 whenever
    this test ran first.  The child process pays one warm-cache re-import;
    the parent process stays torch-execution-free."""
    if os.environ.get("LCRNET_PARITY_SUBPROC") != "1":
        import subprocess

        env = dict(os.environ, LCRNET_PARITY_SUBPROC="1")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x",
             osp.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3600,
            cwd=osp.dirname(osp.dirname(osp.abspath(__file__))),
        )
        assert r.returncode == 0, (
            f"subprocess parity run failed:\n{r.stdout[-4000:]}\n{r.stderr[-2000:]}"
        )
        return
    _run_full_pipeline_parity()


def _run_full_pipeline_parity():
    from full_parity import _match_sets, run_ours, run_reference

    from lcrnet_tpu.config import make_cfg

    limits = make_cfg().shapes.neighbor_limits
    demo = osp.join(REF_ROOT, "demo", "data_demo")
    scans = (
        np.load(osp.join(demo, "003854.npy"))[:, :3].astype(np.float32),
        np.load(osp.join(demo, "000958.npy"))[:, :3].astype(np.float32),
    )

    ref = run_reference(limits, scans)
    ours = run_ours(limits, scans, ref["state_dict"])

    # pyramid stage sets: exact
    for s in range(4):
        for ci in (0, 1):
            a = ref["stage_points"][s][ci]
            b = ours["stage_points"][s][ci]
            assert len(a) == len(b), (s, ci, len(a), len(b))
            idx, dd = _match_sets(a, b, 1e-4)
            assert dd.max() < 1e-3, (s, ci, dd.max())
            assert len(np.unique(idx)) == len(b), (s, ci)

    # stage-4 features: aligned row cosine
    for ci in (0, 1):
        pts_t = ref["stage_points"][3][ci]
        idx, _ = _match_sets(pts_t, ours["s4_points"][ci], 1e-4)
        fa = ref["s4_feats"][ci]
        fb = ours["s4_feats"][ci][idx]
        cos = np.sum(fa * fb, -1) / np.maximum(
            np.linalg.norm(fa, axis=-1) * np.linalg.norm(fb, axis=-1), 1e-12
        )
        assert cos.min() > 0.99, (ci, float(cos.min()))

    # descriptors
    for ci in (0, 1):
        a, b = ref["desc"][ci], ours["desc"][ci]
        cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.85, (ci, cos)
    d_t = float(np.linalg.norm(ref["desc"][0] - ref["desc"][1]))
    d_j = float(np.linalg.norm(ours["desc"][0] - ours["desc"][1]))
    assert abs(d_t - d_j) < 0.02, (d_t, d_j)
