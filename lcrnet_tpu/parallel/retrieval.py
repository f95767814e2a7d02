"""Multi-chip descriptor-database retrieval: sharded causal top-k search.

The reference's loop-candidate retrieval rebuilds a faiss IVFFlat index per
query frame on the host (`eval_loop_detection_overlap_dataset.py:183-215`).
The single-chip replacement is one masked distance matrix + top-k
(`lcrnet_tpu/utils/retrieval.py::causal_topk_search`).  At fleet scale the
O(N^2 d) database scan outgrows one chip's HBM/FLOPs: a KITTI-sized sequence
is small, but a multi-session place-recognition database (10^6 frames) is
not.  This module shards the *database rows* across the mesh's data axis —
each device scans its own slice of the database against the full (replicated)
query block, takes a local top-k with global frame indices, and one small
`all_gather` of (devices × k) candidates per query finishes the exact global
top-k.  Collective payload per query block is k·devices entries instead of
the N-row distance matrix, so the scan rides ICI bandwidth-free for any
realistic k.

Exactness: identical results to the single-device search (same eligibility
mask, same distances, pinned-precision matmul) — pinned by
`tests/test_retrieval.py::test_sharded_causal_topk_matches_single_device`
on an 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

_BIG = 1.0e12
_HI = jax.lax.Precision.HIGHEST


def sharded_causal_topk_search(
    descriptors: np.ndarray,
    k: int,
    exclusion: int = 100,
    mesh: Optional[Mesh] = None,
    axis: str = "dp",
    block: int = 256,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact causal top-k over a database sharded along `axis` of `mesh`.

    For each frame i, the top-k nearest database frames j <= i - exclusion,
    by squared L2 distance over L2-normalized descriptors.  Returns
    (distances (N, k), indices (N, k)); rows with no eligible candidate get
    distance `_BIG` (matching `utils.retrieval.causal_topk_search`).
    """
    if mesh is None:
        # no mesh -> the single-device scan is the same computation
        from lcrnet_tpu.utils.retrieval import causal_topk_search

        return causal_topk_search(descriptors, k, exclusion=exclusion)
    n, d = descriptors.shape
    k = min(k, n)
    ndev = mesh.shape[axis]
    rows_per = -(-n // ndev)  # ceil: every shard holds rows_per database rows
    local_k = min(k, rows_per)

    db = jnp.asarray(
        np.pad(np.asarray(descriptors, np.float32), ((0, rows_per * ndev - n), (0, 0)))
    )
    qpad = (-n) % block
    queries = jnp.asarray(np.pad(np.asarray(descriptors, np.float32), ((0, qpad), (0, 0))))
    qrows = jnp.asarray(np.pad(np.arange(n), (0, qpad), constant_values=-1))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P()),
        out_specs=(P(), P()),
        # outputs ARE replicated (all_gather + identical top_k everywhere)
        # but the checker can't prove it through lax.map
        check_vma=False,
    )
    def search(db_shard, q, qr):
        base = jax.lax.axis_index(axis) * rows_per
        col_ids = base + jnp.arange(rows_per)  # global frame ids of this shard
        in_db = col_ids < n  # padding rows are never candidates

        def one_block(args):
            qb, rb = args  # (block, d), (block,)
            sims = jnp.matmul(qb, db_shard.T, precision=_HI)
            d2 = jnp.maximum(2.0 - 2.0 * sims, 0.0)
            eligible = jnp.logical_and(
                col_ids[None, :] <= rb[:, None] - exclusion, in_db[None, :]
            )
            d2 = jnp.where(eligible, d2, _BIG)
            neg, li = jax.lax.top_k(-d2, local_k)
            return -neg, col_ids[li]

        nb = q.shape[0] // block
        dist_l, idx_l = jax.lax.map(
            one_block, (q.reshape(nb, block, -1), qr.reshape(nb, block))
        )
        dist_l = dist_l.reshape(-1, local_k)
        idx_l = idx_l.reshape(-1, local_k)
        # (ndev, Q, local_k) -> (Q, ndev*local_k) candidates, then global top-k
        dist_all = jax.lax.all_gather(dist_l, axis)
        idx_all = jax.lax.all_gather(idx_l, axis)
        dist_all = jnp.moveaxis(dist_all, 0, 1).reshape(dist_l.shape[0], -1)
        idx_all = jnp.moveaxis(idx_all, 0, 1).reshape(idx_l.shape[0], -1)
        kk = min(k, dist_all.shape[1])
        neg, sel = jax.lax.top_k(-dist_all, kk)
        out_d, out_i = -neg, jnp.take_along_axis(idx_all, sel, axis=1)
        if kk < k:  # more requested than candidates exist anywhere
            pad = ((0, 0), (0, k - kk))
            out_d = jnp.pad(out_d, pad, constant_values=_BIG)
            out_i = jnp.pad(out_i, pad)
        return out_d, out_i

    dists, idx = jax.jit(search)(db.reshape(ndev * rows_per, d), queries, qrows)
    return np.asarray(dists)[:n], np.asarray(idx)[:n]
