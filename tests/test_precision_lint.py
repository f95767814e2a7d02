"""Source lint: coordinate/pose/descriptor matmuls must pin precision.

The TPU default matmul precision rounds INPUTS to bf16.  That has bitten
three separate times (NOTES.md "bf16 traps"): squared-distance expansion on
100 m coordinates (O(10 m^2) error), NetVLAD residuals (descriptor signal
below bf16 resolution, training silently dead), and the Jacobi-Kabsch 3x3
einsums (rotations orthonormal only to ~1e-3).  CPU tests cannot catch the
class at runtime — the CPU backend ignores the default precision — so this
test enforces the rule statically: in the modules whose tensors carry
coordinates, poses, or descriptor residuals, every jnp matmul-family call
must pass `precision=` (or `preferred_element_type=`), and the infix `@`
operator (no way to pin) is banned on jnp arrays.

Feature-path modules (KPConv/attention matmuls) intentionally run at
default precision for MXU throughput and are NOT listed here.
"""

import ast
import os.path as osp

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

# Modules whose jnp matmuls all ride coordinate/pose/descriptor math.
PINNED_MODULES = [
    "lcrnet_tpu/ops/procrustes.py",
    "lcrnet_tpu/ops/transform.py",
    "lcrnet_tpu/ops/pairwise_distance.py",
    "lcrnet_tpu/ops/chamfer.py",
    "lcrnet_tpu/ops/gnc.py",
    "lcrnet_tpu/ops/ransac.py",
    "lcrnet_tpu/ops/gt_matching.py",
    "lcrnet_tpu/ops/pyramid.py",
    "lcrnet_tpu/ops/radius_search.py",
    "lcrnet_tpu/ops/vector_angle.py",
    "lcrnet_tpu/models/netvlad.py",
    "lcrnet_tpu/models/vote.py",
]

MATMUL_NAMES = {"einsum", "matmul", "dot", "tensordot", "dot_general"}


def _violations(path):
    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.MatMult):
            out.append(f"{path}:{node.lineno}: infix `@` (cannot pin precision)")
        if isinstance(node, ast.Call):
            if isinstance(node.func, ast.Attribute):
                name = node.func.attr
                # only jnp/lax receivers: numpy's matmul family has no
                # precision= kwarg and is unaffected by the TPU bf16 default
                recv = node.func.value
                if isinstance(recv, ast.Name):
                    if recv.id not in {"jnp", "lax", "jax"}:
                        continue
                elif isinstance(recv, ast.Attribute):
                    # jax.numpy.einsum / jax.lax.dot_general style
                    root = recv
                    while isinstance(root, ast.Attribute):
                        root = root.value
                    if not (isinstance(root, ast.Name) and root.id == "jax"):
                        continue
                else:
                    continue
            elif isinstance(node.func, ast.Name):
                name = node.func.id
            else:
                continue
            if name in MATMUL_NAMES:
                kws = {k.arg for k in node.keywords}
                if not kws & {"precision", "preferred_element_type"}:
                    out.append(f"{path}:{node.lineno}: {name}() without precision=")
    return out


@pytest.mark.parametrize("rel", PINNED_MODULES)
def test_coordinate_matmuls_pin_precision(rel):
    path = osp.join(REPO, rel)
    assert osp.exists(path), f"lint list is stale: {rel} missing"
    bad = _violations(path)
    assert not bad, "unpinned matmul(s) on a coordinate/pose path:\n" + "\n".join(bad)
