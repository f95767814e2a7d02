"""Checkpointing: orbax-backed snapshot save/load + model merging.

Parity targets:
  - `utils/engine/base_trainer.py:111-177` (per-epoch `epoch-N` snapshots +
    rolling `snapshot` with model/optimizer/epoch/iteration, strict=False
    restore with missing/unexpected key reporting)
  - `merge_model.py:5-34` (graft netvlad.* from a loop-detection snapshot
    into a registration snapshot)
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_snapshot(directory: str, step: int, params, opt_state=None, metadata: Optional[Dict] = None):
    """Save params (+ optimizer state) at `step` under `directory`."""
    directory = osp.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    with ocp.CheckpointManager(directory, options=ocp.CheckpointManagerOptions(create=True)) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(payload), metrics=metadata)
        mgr.wait_until_finished()


def load_snapshot(directory: str, step: Optional[int] = None, template=None) -> Dict[str, Any]:
    """Load the latest (or given) snapshot; returns the payload dict."""
    directory = osp.abspath(directory)
    with ocp.CheckpointManager(directory) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no snapshot in {directory}")
        if template is not None:
            try:
                return mgr.restore(step, args=ocp.args.StandardRestore(template))
            except ValueError:
                # structure mismatch: a snapshot saved WITH opt_state must
                # still load into a params-only template (the reference's
                # strict=False restore, `base_trainer.py:138-177`).  Restore
                # raw and take the requested top-level subtrees.
                raw = mgr.restore(step)
                missing = [k for k in template if k not in raw]
                if missing:
                    raise KeyError(f"snapshot {directory}@{step} lacks {missing}")
                return {
                    k: jax.tree.map(
                        lambda t, v: np.asarray(v, dtype=t.dtype)
                        if hasattr(t, "dtype") else v,
                        template[k], raw[k],
                    )
                    for k in template
                }
        return mgr.restore(step)


def latest_step(directory: str) -> Optional[int]:
    directory = osp.abspath(directory)
    if not osp.isdir(directory):
        return None
    with ocp.CheckpointManager(directory) as mgr:
        return mgr.latest_step()


def merge_netvlad(reg_params, ld_params):
    """Graft the netvlad subtree from a loop-detection checkpoint into a
    registration checkpoint (reference `merge_model.py:5-34`).  Both models
    share one parameter-tree layout, so this is a subtree swap."""
    merged = jax.tree.map(lambda x: x, reg_params)  # shallow-ish copy
    merged["params"] = dict(merged["params"])
    merged["params"]["netvlad"] = ld_params["params"]["netvlad"]
    return merged
