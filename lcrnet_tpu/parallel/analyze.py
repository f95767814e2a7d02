"""Sharding diagnostics: collective inventory of a compiled SPMD program.

Answers "what did XLA actually insert for this mesh?" — the TPU analogue of
profiling the reference's NCCL traffic.  Parses compiled (post-SPMD) HLO for
collective ops and their payload shapes, so tests and NOTES can record e.g.
whether the mp point-axis sharding all-gathers the backbone activations.
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np

_COLLECTIVES = (
    "all-gather",
    "all-reduce",
    "reduce-scatter",
    "all-to-all",
    "collective-permute",
)

_SHAPE_RE = re.compile(r"(?:\(|\s)((?:[a-z0-9]+)\[[0-9,]*\])")
_DTYPE_BYTES = {
    "f32": 4, "f16": 2, "bf16": 2, "f64": 8,
    "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8,
}


def _shape_bytes(shape_str: str) -> int:
    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape_str)
    if not m:
        return 0
    dtype, dims = m.groups()
    n = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1
    return n * _DTYPE_BYTES.get(dtype, 4)


def collective_inventory(compiled) -> List[Dict]:
    """List collectives in a jax `compiled` object (from .lower().compile()).

    Returns [{op, shape, bytes}] sorted by payload size, largest first.
    """
    txt = compiled.as_text()
    out = []
    for line in txt.splitlines():
        stripped = line.strip()
        # match the op on the instruction name (rhs of '='), not operands
        rhs = stripped.split("=", 1)[1] if "=" in stripped else stripped
        for coll in _COLLECTIVES:
            if re.search(rf"\b{coll}(?:-start|-done)?\(", rhs) or re.search(
                rf"\b{coll}(?:-start)?\b", rhs.split("(")[0]
            ):
                shapes = _SHAPE_RE.findall(stripped.split("=", 1)[0]) or _SHAPE_RE.findall(rhs)
                size = max((_shape_bytes(s) for s in shapes), default=0)
                out.append({"op": coll, "shape": shapes[0] if shapes else "?", "bytes": size})
                break
    return sorted(out, key=lambda d: -d["bytes"])


def summarize(compiled, top: int = 10) -> str:
    inv = collective_inventory(compiled)
    total = sum(d["bytes"] for d in inv)
    lines = [f"collectives: {len(inv)}, total payload {total / 1e6:.2f} MB"]
    for d in inv[:top]:
        lines.append(f"  {d['op']:<20} {d['shape']:<24} {d['bytes'] / 1e6:.3f} MB")
    return "\n".join(lines)
