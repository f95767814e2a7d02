"""Fused Pallas TPU kernel for log-domain Sinkhorn iteration.

The XLA scan version (`ops/sinkhorn.py`) streams the (B, M+1, N+1) score
tensor through HBM ~200 times (100 iterations x 2 logsumexp passes).  This
kernel keeps a block of patches resident in VMEM for the entire iteration
loop: one HBM read of the scores, 100 fused max/exp/log passes on the VPU,
one HBM write.  Numerics are identical to `log_optimal_transport` (same
-1e12 masking convention, verified against the same numpy oracle) up to the
float associativity of summing the dustbin term after the main columns.

Layout: the dustbin row/column (always the LAST row/column of the padded
score tensor) is stored SEPARATELY from the (M, N) main block.  The
production shapes are M = N = 128 (patch OT, K points per patch) and
M = N = 512 (node OT, max_nodes): with the dustbin inline they pad to
(136, 256) / (520, 640) vector tiles — 2.1x / 1.27x wasted VPU arithmetic
for 100 iterations — while the split main blocks tile exactly.  Each
logsumexp then reduces over the main lanes and folds in the single dustbin
element under the same running max (one extra (PB, M)-shaped exp per pass,
~1/128th of the main work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1.0e12


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sinkhorn_kernel(
    valid_ref,
    s_mm_ref, s_mc_ref, s_rm_ref, s_cc_ref,
    mu_m_ref, mu_d_ref, nu_m_ref, nu_d_ref,
    o_mm_ref, o_mc_ref, o_rm_ref, o_cc_ref,
    *, num_iterations,
):
    """One batch block, dustbin-split layout.

    valid_ref: scalar-prefetch (grid,) per-block any-valid flags — a block
    whose every batch entry is caller-declared invalid SKIPS the whole
    iteration loop (grid-level dynamic sparsity: the static patch capacity
    is sized for the worst case, while the typical valid coarse-
    correspondence count is far below it).
    s_mm: (PB, MP, NP) main scores; s_mc: (PB, MP) dustbin column;
    s_rm: (PB, NP) dustbin row; s_cc: (PB, 1) corner (alpha).
    mu/nu are split the same way ((PB, MP)/(PB, 1) and (PB, NP)/(PB, 1)).
    """
    i = pl.program_id(0)

    @pl.when(valid_ref[i] > 0)
    def _run():
        s = s_mm_ref[:]
        sc = s_mc_ref[:]
        sr = s_rm_ref[:]
        scc = s_cc_ref[:]
        mu_m = mu_m_ref[:]
        mu_d = mu_d_ref[:]
        nu_m = nu_m_ref[:]
        nu_d = nu_d_ref[:]

        def body(_, carry):
            u_m, u_d, v_m, v_d = carry
            # row normalization: logsumexp over main cols + dustbin col
            z = s + v_m[:, None, :]                     # (PB, MP, NP)
            zc = sc + v_d                               # (PB, MP)
            m = jnp.maximum(jnp.max(z, axis=2), zc)
            u_m = mu_m - (
                m + jnp.log(jnp.sum(jnp.exp(z - m[:, :, None]), axis=2) + jnp.exp(zc - m))
            )
            zr = sr + v_m                               # (PB, NP)
            zrc = scc + v_d                             # (PB, 1)
            md = jnp.maximum(jnp.max(zr, axis=1, keepdims=True), zrc)
            u_d = mu_d - (
                md + jnp.log(jnp.sum(jnp.exp(zr - md), axis=1, keepdims=True) + jnp.exp(zrc - md))
            )
            # column normalization: logsumexp over main rows + dustbin row
            z2 = s + u_m[:, :, None]
            z2r = sr + u_d                              # (PB, NP)
            m2 = jnp.maximum(jnp.max(z2, axis=1), z2r)
            v_m = nu_m - (
                m2 + jnp.log(jnp.sum(jnp.exp(z2 - m2[:, None, :]), axis=1) + jnp.exp(z2r - m2))
            )
            z2c = sc + u_m                              # (PB, MP)
            z2cc = scc + u_d
            m2d = jnp.maximum(jnp.max(z2c, axis=1, keepdims=True), z2cc)
            v_d = nu_d - (
                m2d + jnp.log(jnp.sum(jnp.exp(z2c - m2d), axis=1, keepdims=True) + jnp.exp(z2cc - m2d))
            )
            return u_m, u_d, v_m, v_d

        init = (jnp.zeros_like(mu_m), jnp.zeros_like(mu_d),
                jnp.zeros_like(nu_m), jnp.zeros_like(nu_d))
        u_m, u_d, v_m, v_d = lax.fori_loop(0, num_iterations, body, init)
        o_mm_ref[:] = s + u_m[:, :, None] + v_m[:, None, :]
        o_mc_ref[:] = sc + u_m + v_d
        o_rm_ref[:] = sr + u_d + v_m
        o_cc_ref[:] = scc + u_d + v_d

    @pl.when(valid_ref[i] == 0)
    def _skip():
        # deterministic output for caller-declared-invalid batches: -inf
        # everywhere (their assignment is meaningless and masked downstream)
        o_mm_ref[:] = jnp.full(o_mm_ref.shape, -_INF, o_mm_ref.dtype)
        o_mc_ref[:] = jnp.full(o_mc_ref.shape, -_INF, o_mc_ref.dtype)
        o_rm_ref[:] = jnp.full(o_rm_ref.shape, -_INF, o_rm_ref.dtype)
        o_cc_ref[:] = jnp.full(o_cc_ref.shape, -_INF, o_cc_ref.dtype)


def sinkhorn_padded_pallas(
    padded_scores: jnp.ndarray,
    log_mu: jnp.ndarray,
    log_nu: jnp.ndarray,
    num_iterations: int,
    patch_block: int = 8,
    interpret: bool = False,
    batch_valid=None,
) -> jnp.ndarray:
    """Run the fused iteration on an already-masked padded score tensor.

    Args:
      padded_scores: (B, M1, N1) with dustbin row/col appended and invalid
        entries at -1e12 (the tensor `log_optimal_transport` builds before
        its scan).
      log_mu/log_nu: (B, M1), (B, N1) log marginals (-1e12 at invalid).
      batch_valid: optional (B,) bool — batches declared invalid return
        -inf rows instead of Sinkhorn outputs, and BLOCKS of `patch_block`
        consecutive invalid batches skip the whole iteration loop on
        device.  The static patch capacity is worst-case-sized
        (node_corr_limit = M+N) while the runtime valid count is typically
        well under half of it — this is the dynamic-sparsity lever that
        keeps the fused kernel from paying for padding (measured: patch OT
        was the single largest op of the pair forward, ~40 ms of ~158 ms).

    Returns (B, M1, N1) log assignment (before the final -norm shift).
    """
    b, m1, n1 = padded_scores.shape
    m, n = m1 - 1, n1 - 1  # main block (dustbin row/col split out)
    mp = _round_up(max(m, 8), 8)
    np_ = _round_up(max(n, 128), 128)
    pb = min(patch_block, b)
    bp = _round_up(b, pb)
    dt = padded_scores.dtype

    s_mm = jnp.full((bp, mp, np_), -_INF, dt).at[:b, :m, :n].set(padded_scores[:, :m, :n])
    s_mc = jnp.full((bp, mp), -_INF, dt).at[:b, :m].set(padded_scores[:, :m, n])
    s_rm = jnp.full((bp, np_), -_INF, dt).at[:b, :n].set(padded_scores[:, m, :n])
    s_cc = jnp.full((bp, 1), -_INF, dt).at[:b, 0].set(padded_scores[:, m, n])
    mu_m = jnp.full((bp, mp), -_INF, dt).at[:b, :m].set(log_mu[:, :m])
    mu_d = jnp.full((bp, 1), -_INF, dt).at[:b, 0].set(log_mu[:, m])
    nu_m = jnp.full((bp, np_), -_INF, dt).at[:b, :n].set(log_nu[:, :n])
    nu_d = jnp.full((bp, 1), -_INF, dt).at[:b, 0].set(log_nu[:, n])

    grid_n = bp // pb
    if batch_valid is None:
        blk_valid = jnp.ones((grid_n,), jnp.int32)
    else:
        bv = jnp.zeros((bp,), jnp.int32).at[:b].set(batch_valid.astype(jnp.int32))
        blk_valid = jnp.max(bv.reshape(grid_n, pb), axis=1)

    kernel = functools.partial(_sinkhorn_kernel, num_iterations=num_iterations)
    vec = lambda width: pl.BlockSpec((pb, width), lambda i, v: (i, 0), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((pb, mp, np_), lambda i, v: (i, 0, 0), memory_space=pltpu.VMEM)
    o_mm, o_mc, o_rm, o_cc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid_n,),
            in_specs=[blk, vec(mp), vec(np_), vec(1), vec(mp), vec(1), vec(np_), vec(1)],
            out_specs=[blk, vec(mp), vec(np_), vec(1)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bp, mp, np_), dt),
            jax.ShapeDtypeStruct((bp, mp), dt),
            jax.ShapeDtypeStruct((bp, np_), dt),
            jax.ShapeDtypeStruct((bp, 1), dt),
        ],
        interpret=interpret,
    )(blk_valid, s_mm, s_mc, s_rm, s_cc, mu_m, mu_d, nu_m, nu_d)

    out = jnp.concatenate(
        [
            jnp.concatenate([o_mm[:b, :m, :n], o_mc[:b, :m, None]], axis=2),
            jnp.concatenate([o_rm[:b, None, :n], o_cc[:b, :, None]], axis=2),
        ],
        axis=1,
    )
    return out
