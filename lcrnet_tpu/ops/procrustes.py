"""Weighted Procrustes (Kabsch) rigid fit — fully on device.

Parity target: `experiments/lcrnet/modules/registration/procrustes.py:6-91`.
The reference hops to the CPU for the SVD (`torch.svd(H.cpu())`,
procrustes.py:53); here the batched 3x3 SVD runs on the TPU via
jnp.linalg.svd in fp32, with the same det-sign reflection fix.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from lcrnet_tpu.ops.transform import get_transform_from_rotation_translation


def weighted_procrustes(
    src_points: jnp.ndarray,
    ref_points: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    weight_thresh: float = 0.0,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Weighted rigid fit src -> ref.

    Args:
      src_points/ref_points: (B, N, 3) or (N, 3)
      weights: (B, N) or (N,) non-negative (None = uniform). Zero-weight rows
        are ignored; degenerate all-zero batches yield identity-ish results
        (H -> 0) without NaNs.

    Returns:
      (B, 4, 4) or (4, 4) transforms.
    """
    squeeze = src_points.ndim == 2
    if squeeze:
        src_points = src_points[None]
        ref_points = ref_points[None]
        if weights is not None:
            weights = weights[None]
    b = src_points.shape[0]
    if weights is None:
        weights = jnp.ones(src_points.shape[:2], src_points.dtype)
    weights = jnp.where(weights < weight_thresh, 0.0, weights)
    weights = weights / (jnp.sum(weights, axis=1, keepdims=True) + eps)
    w = weights[:, :, None]

    src_centroid = jnp.sum(src_points * w, axis=1, keepdims=True)
    ref_centroid = jnp.sum(ref_points * w, axis=1, keepdims=True)
    src_c = src_points - src_centroid
    ref_c = ref_points - ref_centroid

    h = jnp.einsum(
        "bnc,bnd->bcd",
        src_c.astype(jnp.float32),
        (w * ref_c).astype(jnp.float32),
        precision="highest",  # coordinate math: no bf16 on TPU
    )
    u, _, vt = jnp.linalg.svd(h)
    ut = jnp.swapaxes(u, -1, -2)
    v = jnp.swapaxes(vt, -1, -2)
    # the 3x3 composition matmuls must not drop to bf16 either: at default
    # precision R came out orthonormal only to ~2e-3 (visible in demo poses)
    det = jnp.linalg.det(jnp.matmul(v, ut, precision="highest"))
    diag = jnp.stack(
        [jnp.ones((b,), h.dtype), jnp.ones((b,), h.dtype), jnp.sign(det)], axis=-1
    )
    r = jnp.matmul(v * diag[:, None, :], ut, precision="highest")
    t = ref_centroid[:, 0, :] - jnp.einsum(
        "bij,bj->bi", r, src_centroid[:, 0, :], precision="highest"
    )
    transform = get_transform_from_rotation_translation(r, t)
    if squeeze:
        transform = transform[0]
    return transform
