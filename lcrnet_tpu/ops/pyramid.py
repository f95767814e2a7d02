"""On-device multi-scale pyramid construction.

Parity target: `experiments/lcrnet/data.py:10-74`
(`precompute_data_stack_mode`): per stage, grid-subsample at doubling voxel
size, then compute three neighbor tables — self neighbors, subsampling
(coarse queries over fine supports) and upsampling (fine queries over coarse
supports at 2x radius).

The reference runs this in CPU DataLoader worker processes with nanoflann;
here the whole pyramid is built inside the jitted step on device (the core
architectural inversion of the TPU build — SURVEY.md §7).  Natively batched
over the cloud axis: all clouds' query blocks flatten into single lax.map
sweeps (vmapping per-cloud searches compiles ~4x slower on TPU).

The upsampling tables are width-1 nearest-in-radius lookups (argmin, no
sort): their only consumer is nearest_upsample, which reads column 0
(`modules/kpconv/functional.py:6-23`); the reference stores full-width
tables it never reads past the first column of.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from lcrnet_tpu.ops.grid_subsample import grid_subsample
from lcrnet_tpu.ops.radius_search import (
    nearest_search_batched,
    radius_search,
    radius_search_batched,
    radius_search_cells_batched,
)

# supports above this size use the banded search (x-sorted contiguous
# windows); below it the dense sweep wins on fixed overheads.  On TPU the
# banded selection runs as the fused Pallas kernel (whole argmin-extraction
# loop VMEM-resident).  The cell-list variant exists too but its scattered
# gathers lose badly on TPU.
_BANDED_SEARCH_MIN_SUPPORT = 4096


def _search(q, s, qm, sm, radius, limit, fast_select=False, window=4224):
    # the packed extraction reorders near-ties (r^2/2048); honor it only on
    # TPU so CPU tests stay bit-exact against the numpy oracles
    fast_select = fast_select and jax.default_backend() == "tpu"
    # pyramid stages are kept in canonical x-sorted order (pads at the
    # tail), so the banded searches skip their argsorts, the support-order
    # remap gather and the query un-permute — the dominant non-kernel costs
    # (~37 ms/pair measured).  Stage capacities are multiples of the block
    # sizes, so concatenated (self + subsampling) query parts stay aligned.
    aligned = s.shape[1] % 128 == 0
    on_tpu = jax.default_backend() == "tpu"
    # the fused Pallas kernel pays off well below the XLA banded path's
    # break-even: at stage-2 scale (q 3328, s 2560, limit 68) it measures
    # 4.4 ms vs 9.0 ms for the dense packed sweep; at s=768 the dense
    # path wins on grid overheads (measured 1.8 vs 2.4 ms)
    if on_tpu and limit <= 96 and aligned and s.shape[1] >= 1024:
        from lcrnet_tpu.ops.radius_search_pallas import radius_search_banded_pallas

        return radius_search_banded_pallas(
            q, s, qm, sm, radius, limit, fast_select=fast_select, window=window,
            presorted=True,
        )
    if aligned and s.shape[1] >= _BANDED_SEARCH_MIN_SUPPORT:
        from lcrnet_tpu.ops.radius_search import radius_search_banded_batched

        return radius_search_banded_batched(
            q, s, qm, sm, radius, limit, window=window, presorted=True
        )
    return radius_search_batched(q, s, qm, sm, radius, limit, fast_select=fast_select)


class Pyramid(NamedTuple):
    """Static-shape pyramid, batched over clouds (tuple fields per stage)."""

    points: Tuple[jnp.ndarray, ...]        # (B, N_s, 3) per stage
    masks: Tuple[jnp.ndarray, ...]         # (B, N_s) bool per stage
    neighbors: Tuple[jnp.ndarray, ...]     # (B, N_s, L_s) self neighbor tables
    neighbor_masks: Tuple[jnp.ndarray, ...]
    subsampling: Tuple[jnp.ndarray, ...]   # (B, N_{s+1}, L_s) coarse<-fine pooling
    subsampling_masks: Tuple[jnp.ndarray, ...]
    upsampling: Tuple[jnp.ndarray, ...]    # (B, N_s, 1) fine<-coarse nearest
    upsampling_masks: Tuple[jnp.ndarray, ...]


def build_pyramid_batched(
    points: jnp.ndarray,
    masks: jnp.ndarray,
    stage_capacities: Sequence[int],
    neighbor_limits: Sequence[int],
    init_voxel_size: float,
    init_radius: float,
    fast_select: bool = False,
    search_windows=None,
) -> Pyramid:
    """Build pyramids for (B, N0, 3) padded clouds in one pass."""
    num_stages = len(stage_capacities)
    assert len(neighbor_limits) == num_stages
    if search_windows is None:
        search_windows = (4224,) * num_stages

    def sort_by_x(p, m):
        """Canonical stage order: x-ascending, pads at the tail.  Point ORDER
        is an internal pyramid convention (all consumers are index-table- or
        coordinate-based); sorting once per stage lets every banded search
        run in presorted mode and makes neighbor gathers band-local."""
        key = jnp.where(m, p[..., 0], 1.0e9)
        order = jnp.argsort(key, axis=-1).astype(jnp.int32)
        return (
            jnp.take_along_axis(p, order[..., None], axis=1),
            jnp.take_along_axis(m, order, axis=-1),
        )

    p0, m0 = sort_by_x(points, masks)
    pts = [p0]
    msks = [m0]
    voxel = init_voxel_size * 2.0
    for i in range(1, num_stages):
        p, m = jax.vmap(
            lambda a, b, voxel=voxel, cap=stage_capacities[i]: grid_subsample(a, b, voxel, cap)
        )(pts[-1], msks[-1])
        p, m = sort_by_x(p, m)
        pts.append(p)
        msks.append(m)
        voxel *= 2.0

    neighbors, neighbor_masks = [], []
    subsampling, subsampling_masks = [], []
    upsampling, upsampling_masks = [], []
    radius = init_radius
    for i in range(num_stages):
        if i < num_stages - 1:
            # fuse the self search (stage-i queries) and the subsampling
            # search (stage-(i+1) queries) over the SAME supports/radius/
            # limit into one kernel sweep: the support x-sort, window
            # binary-searches and selection grid run once instead of twice
            n_i = pts[i].shape[1]
            q = jnp.concatenate([pts[i], pts[i + 1]], axis=1)
            qm = jnp.concatenate([msks[i], msks[i + 1]], axis=1)
            idx, val = _search(q, pts[i], qm, msks[i], radius, neighbor_limits[i], fast_select, search_windows[i])
            neighbors.append(idx[:, :n_i])
            neighbor_masks.append(val[:, :n_i])
            subsampling.append(idx[:, n_i:])
            subsampling_masks.append(val[:, n_i:])
            # upsampling = nearest stage-(i+1) support within radius*2: the
            # SAME support density and radius as the stage-(i+1) self search,
            # so it rides the banded kernel with limit=1 and that stage's
            # calibrated window instead of a dense (N_i x N_{i+1}) sweep
            # (dense s0 upsample alone measured ~9 ms/pair)
            if pts[i + 1].shape[1] >= _BANDED_SEARCH_MIN_SUPPORT:
                nidx, nval = _search(
                    pts[i], pts[i + 1], msks[i], msks[i + 1], radius * 2.0,
                    1, fast_select, search_windows[i + 1],
                )
                nidx, nval = nidx[..., 0], nval[..., 0]
            else:
                nidx, nval = nearest_search_batched(
                    pts[i], pts[i + 1], msks[i], msks[i + 1], radius * 2.0
                )
            upsampling.append(nidx[..., None])
            upsampling_masks.append(nval[..., None])
        else:
            idx, val = _search(pts[i], pts[i], msks[i], msks[i], radius, neighbor_limits[i], fast_select, search_windows[i])
            neighbors.append(idx)
            neighbor_masks.append(val)
        radius *= 2.0

    return Pyramid(
        points=tuple(pts),
        masks=tuple(msks),
        neighbors=tuple(neighbors),
        neighbor_masks=tuple(neighbor_masks),
        subsampling=tuple(subsampling),
        subsampling_masks=tuple(subsampling_masks),
        upsampling=tuple(upsampling),
        upsampling_masks=tuple(upsampling_masks),
    )


def build_pyramid(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    stage_capacities: Sequence[int],
    neighbor_limits: Sequence[int],
    init_voxel_size: float,
    init_radius: float,
) -> Pyramid:
    """Single-cloud pyramid (tables without the batch axis) — test helper."""
    pyr = build_pyramid_batched(
        points[None], mask[None], stage_capacities, neighbor_limits, init_voxel_size, init_radius
    )
    return jax.tree.map(lambda x: x[0], pyr)
