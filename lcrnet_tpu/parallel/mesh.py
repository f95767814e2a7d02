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
