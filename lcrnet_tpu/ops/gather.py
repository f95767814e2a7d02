"""Masked gather helpers (the `index_select` + shadow-row idiom).

Parity target: `experiments/lcrnet/modules/ops/index_select.py:4-38` combined
with the reference's pad-then-gather convention (append a shadow row, sentinel
index = N).  Here the mask is explicit: gathers clamp indices and zero (or
fill) invalid lanes, which XLA lowers to a single HBM gather without the
concatenation the reference does on every call.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_gather(
    data: jnp.ndarray,
    indices: jnp.ndarray,
    valid: jnp.ndarray,
    fill_value: float = 0.0,
) -> jnp.ndarray:
    """Gather rows of ``data`` (N, C...) at ``indices`` (...,) -> (..., C...).

    Invalid lanes (valid == False) produce ``fill_value``.  Indices may
    contain the one-past-end sentinel N; they are clamped before the gather.
    """
    n = data.shape[0]
    idx = jnp.clip(indices, 0, n - 1)
    out = data[idx]
    expand = valid.reshape(valid.shape + (1,) * (out.ndim - valid.ndim))
    return jnp.where(expand, out, fill_value)


def index_select(data: jnp.ndarray, indices: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Advanced gather along ``axis`` (expands axis by the index shape)."""
    return jnp.take(data, indices, axis=axis)
