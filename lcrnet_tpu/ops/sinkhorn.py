"""Log-domain Sinkhorn optimal transport with learnable dustbin.

Parity target: `experiments/lcrnet/modules/sinkhorn/learnable_sinkhorn.py:5-70`
(SuperGlue-style: append dustbin row/col filled with the learnable alpha,
mask invalid rows/cols at -inf, run ``num_iterations`` of alternating
row/col log-normalization against log_mu/log_nu derived from valid counts).

Two backends over identical numerics:
  * `lax.scan` (differentiable — used on the training path and on CPU)
  * fused Pallas kernel (`sinkhorn_pallas.py`) keeping the score block in
    VMEM for all iterations — used on the TPU inference path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_INF = 1.0e12


def _build_padded(scores, alpha, row_masks, col_masks):
    """Dustbin-extended, masked score tensor + log marginals."""
    b, m, n = scores.shape
    alpha = alpha.astype(scores.dtype)

    padded_row_invalid = jnp.concatenate(
        [jnp.logical_not(row_masks), jnp.zeros((b, 1), jnp.bool_)], axis=1
    )  # (B, M+1) True where invalid (dustbin always valid)
    padded_col_invalid = jnp.concatenate(
        [jnp.logical_not(col_masks), jnp.zeros((b, 1), jnp.bool_)], axis=1
    )

    padded = jnp.pad(scores, ((0, 0), (0, 1), (0, 1)), constant_values=0.0)
    pad_mask = jnp.pad(jnp.ones((b, m, n), jnp.bool_), ((0, 0), (0, 1), (0, 1)))
    padded = jnp.where(pad_mask, padded, alpha)  # dustbin row/col = alpha
    invalid = jnp.logical_or(padded_row_invalid[:, :, None], padded_col_invalid[:, None, :])
    padded = jnp.where(invalid, -_INF, padded)

    # clamp below at 1 so fully-invalid batches (empty capacity padding in the
    # static layout) stay finite; their outputs are masked downstream
    num_valid_row = jnp.maximum(jnp.sum(row_masks.astype(scores.dtype), axis=1), 1.0)
    num_valid_col = jnp.maximum(jnp.sum(col_masks.astype(scores.dtype), axis=1), 1.0)
    norm = -jnp.log(num_valid_row + num_valid_col)  # (B,)

    log_mu = jnp.concatenate(
        [jnp.broadcast_to(norm[:, None], (b, m)), (jnp.log(num_valid_col) + norm)[:, None]],
        axis=1,
    )
    log_mu = jnp.where(padded_row_invalid, -_INF, log_mu)
    log_nu = jnp.concatenate(
        [jnp.broadcast_to(norm[:, None], (b, n)), (jnp.log(num_valid_row) + norm)[:, None]],
        axis=1,
    )
    log_nu = jnp.where(padded_col_invalid, -_INF, log_nu)
    return padded, log_mu, log_nu, norm


def log_optimal_transport(
    scores: jnp.ndarray,
    alpha: jnp.ndarray,
    row_masks: jnp.ndarray,
    col_masks: jnp.ndarray,
    num_iterations: int,
    fused: bool = False,
    batch_valid=None,
) -> jnp.ndarray:
    """Masked Sinkhorn in log space.

    Args:
      scores: (B, M, N) similarity logits.
      alpha: scalar learnable dustbin score.
      row_masks: (B, M) bool; col_masks: (B, N) bool.
      num_iterations: static iteration count.
      fused: use the VMEM-resident Pallas kernel (inference-only: the fused
        path is not differentiable; the scan path is).
      batch_valid: optional (B,) bool batch-entry validity.  On the fused
        path, whole 8-entry patch blocks with no valid batch skip their
        device compute and return -inf (the static capacity is worst-case
        sized; the runtime valid count usually is not); invalid entries
        sharing a block with valid ones compute normally.  Consumers must
        mask by the same flags, which every call site already does.  The
        scan path ignores it (identical math for all batches).

    Returns:
      (B, M+1, N+1) log assignment scores.
    """
    padded, log_mu, log_nu, norm = _build_padded(scores, alpha, row_masks, col_masks)

    if fused:
        backend = jax.default_backend()
        from lcrnet_tpu.ops.sinkhorn_pallas import sinkhorn_padded_pallas

        out = sinkhorn_padded_pallas(
            padded, log_mu, log_nu, num_iterations, interpret=(backend != "tpu"),
            batch_valid=batch_valid,
        )
        return out - norm[:, None, None]

    def step(carry, _):
        u, v = carry
        u = log_mu - _logsumexp(padded + v[:, None, :], axis=2)
        v = log_nu - _logsumexp(padded + u[:, :, None], axis=1)
        return (u, v), None

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    (u, v), _ = lax.scan(step, (u0, v0), None, length=num_iterations)
    out = padded + u[:, :, None] + v[:, None, :]
    return out - norm[:, None, None]


def _logsumexp(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    x_max = lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    x_max = jnp.where(jnp.isfinite(x_max), x_max, 0.0)
    return jnp.squeeze(x_max, axis) + jnp.log(
        jnp.sum(jnp.exp(x - x_max), axis=axis)
    )
