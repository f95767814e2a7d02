"""Ring halo exchange for point-axis (mp) sharding of the KPConv backbone.

The pyramid's canonical x-sorted ordering (ops/pyramid.py) makes every
neighbor table BANDED: a query at sorted position i only references support
rows within a bounded distance of i's proportional position (measured on the
six real KITTI-00 scans: self0 <= 1787 rows, sub0->1 <= 2528, up1->0 <= 943,
self1 <= 781, sub1->2 <= 1615 — all under one shard of the stage capacity for
mp <= 4).  Point-axis sharding therefore never needs an all-gather of the
fine-stage features: each device's queries are satisfied by the features of
its own shard plus its two ring neighbors.

This module provides that exchange and the index remap.  It is the explicit
SPMD alternative to letting XLA's automatic propagation handle the mp axis,
which at production shapes materializes ~908 MB/step of all-gathers and
scatter partial-sums (see tests/test_engine.py::
test_sharded_step_collective_inventory_real_shapes).

The reference has no model-parallel mode at all (DDP only,
`utils/engine/base_trainer.py:64-87`); this axis is TPU-native extra capacity
for latency scaling.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def shard_slice(x: jnp.ndarray, axis_name: str, axis: int = 1) -> jnp.ndarray:
    """Slice this device's shard of a REPLICATED per-stage array.

    Inside shard_map with a replicated in_spec every device sees the full
    (B, N, ...) array; the feature path works on rows
    [k*L, (k+1)*L) with L = N / mesh_size.
    """
    size = lax.axis_size(axis_name)
    n = x.shape[axis]
    assert n % size == 0, (n, size)
    l = n // size
    k = lax.axis_index(axis_name)
    return lax.dynamic_slice_in_dim(x, k * l, l, axis=axis)


def ring_exchange(x: jnp.ndarray, axis_name: str, axis: int = 1) -> jnp.ndarray:
    """(B, L, ...) local shard -> (B, 3L, ...) [left | local | right] slab.

    Boundary devices receive zeros for the missing neighbor (those rows are
    never referenced by valid banded indices, and the remap mask guards the
    rest).  Two collective-permutes ride neighbor ICI links — the cheapest
    possible exchange topology on a TPU mesh.
    """
    size = lax.axis_size(axis_name)
    if size == 1:
        return x
    # send my shard to the right neighbor => I receive my LEFT neighbor's
    left = lax.ppermute(x, axis_name, [(i, i + 1) for i in range(size - 1)])
    # send my shard to the left neighbor => I receive my RIGHT neighbor's
    right = lax.ppermute(x, axis_name, [(i + 1, i) for i in range(size - 1)])
    return jnp.concatenate([left, x, right], axis=axis)


def remap_to_slab(
    idx: jnp.ndarray,
    valid: jnp.ndarray,
    support_len: int,
    axis_name: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Remap GLOBAL support indices to [left|local|right] slab positions.

    idx: (B, M_local, H) global row indices into the (B, N_support) stage;
    valid: same-shape mask.  support_len = N_support / mesh_size (one shard).
    Returns (slab_idx, valid') where rows outside the slab are masked out —
    by the banded-table calibration those are only PAD/sentinel entries, but
    the mask keeps the math safe if a pathological cloud ever escapes.
    """
    k = lax.axis_index(axis_name)
    base = (k - 1) * support_len
    slab_idx = idx - base
    in_slab = (slab_idx >= 0) & (slab_idx < 3 * support_len)
    slab_idx = jnp.clip(slab_idx, 0, 3 * support_len - 1)
    return slab_idx, valid & in_slab


def all_gather_rows(x: jnp.ndarray, axis_name: str, axis: int = 1) -> jnp.ndarray:
    """(B, L, ...) shard -> (B, N, ...) full array (row-major device order)."""
    return lax.all_gather(x, axis_name, axis=axis, tiled=True)


def slab_slice(x: jnp.ndarray, axis_name: str, fill=0.0) -> jnp.ndarray:
    """REPLICATED (B, N, ...) -> this device's (B, 3L, ...) slab rows.

    The local-compute companion of `ring_exchange`: coordinates, masks and
    static tables are replicated inside shard_map, so the slab is a pad +
    dynamic_slice — no communication.  Out-of-range boundary rows get
    `fill` (False for masks), matching ring_exchange's zero edges.
    """
    size = lax.axis_size(axis_name)
    n = x.shape[1]
    assert n % size == 0, (n, size)
    l = n // size
    k = lax.axis_index(axis_name)
    pad_width = ((0, 0), (l, l)) + ((0, 0),) * (x.ndim - 2)
    padded = jnp.pad(x, pad_width, constant_values=fill)
    return lax.dynamic_slice_in_dim(padded, k * l, 3 * l, axis=1)
