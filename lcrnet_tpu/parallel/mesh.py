"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: Optional[int] = None, mp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('dp', 'mp') mesh over the available devices.

    dp defaults to len(devices) // mp.  Multi-host setups should call
    jax.distributed.initialize() first; jax.devices() then spans all hosts
    and the dp axis rides DCN while mp stays within a slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // mp
    assert dp * mp <= len(devices), f"need {dp * mp} devices, have {len(devices)}"
    arr = np.array(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, axis_names=("dp", "mp"))


def setup_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host initialization (replaces the reference's
    torch.distributed/NCCL process-group setup, `base_trainer.py:64-87`).

    Call before any other jax API.  On TPU pods the three arguments are
    auto-discovered from the environment and may be omitted; passing them
    explicitly supports manual launches (and the CPU Gloo backend used by
    the two-process smoke test).  Returns True if distributed mode is on.
    """
    if coordinator is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_local_batch_slice(total_batch: int) -> slice:
    """The slice of a globally-indexed batch this process should load —
    the host-sharding analogue of the reference's DistributedSampler."""
    per = total_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
