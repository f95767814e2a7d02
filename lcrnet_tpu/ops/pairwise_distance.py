"""Batched pairwise squared distances.

Parity target: `experiments/lcrnet/modules/ops/pairwise_distance.py:4-51`
(x^2 - 2xy + y^2 formulation, clamped at 1e-12).  On TPU the xy term is a
single MXU matmul; we force fp32 accumulation with preferred_element_type.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def pairwise_distance(x: jnp.ndarray, y: jnp.ndarray, normalized: bool = False) -> jnp.ndarray:
    """Squared L2 distances between (*, N, C) and (*, M, C) -> (*, N, M).

    If ``normalized`` (unit-norm rows), uses d2 = 2 - 2 xy.
    Clamped at 1e-12 like the reference to keep sqrt-gradients finite.
    """
    # Precision.HIGHEST is load-bearing: the TPU default computes matmul
    # inputs in bf16, and with |coord| ~ 100 m the x^2 - 2xy + y^2
    # cancellation then carries O(10 m^2) error — radius predicates break.
    xy = lax.dot_general(
        x,
        y,
        dimension_numbers=(((x.ndim - 1,), (y.ndim - 1,)), (tuple(range(x.ndim - 2)), tuple(range(y.ndim - 2)))),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    if normalized:
        sq = 2.0 - 2.0 * xy
    else:
        x2 = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1)[..., :, None]
        y2 = jnp.sum(y.astype(jnp.float32) ** 2, axis=-1)[..., None, :]
        sq = x2 - 2.0 * xy + y2
    return jnp.maximum(sq, 1e-12)
