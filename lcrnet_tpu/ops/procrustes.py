"""Weighted Procrustes (Kabsch) rigid fit — fully on device.

Parity target: `experiments/lcrnet/modules/registration/procrustes.py:6-91`.
The reference hops to the CPU for the SVD (`torch.svd(H.cpu())`,
procrustes.py:53); here the batched 3x3 SVD runs on the TPU via
jnp.linalg.svd in fp32, with the same det-sign reflection fix.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lcrnet_tpu.ops.transform import get_transform_from_rotation_translation


def _jacobi_svd_one_sided(h: jnp.ndarray, sweeps: int = 8):
    """One-sided Jacobi SVD sweep for batched 3x3: returns (B, V) with
    B = H @ V having orthogonal columns (sigma_i * u_i) and det(V) = +1.

    Works on H directly — NOT on H^T H, whose formation squares the
    condition number and (measured) costs real pose accuracy on the
    near-planar patches LiDAR produces.  Fixed sweep count, fully
    unrolled — no `while` loop, unlike the qdwh path jnp.linalg.svd
    lowers to on TPU.
    """
    b = h
    v = jnp.broadcast_to(jnp.eye(3, dtype=h.dtype), h.shape)
    zero = jnp.zeros(h.shape[:-2], h.dtype)
    one = jnp.ones(h.shape[:-2], h.dtype)
    for _ in range(sweeps):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            # orthogonalize columns p and q of B by a right rotation
            bp, bq = b[..., :, p], b[..., :, q]
            app = jnp.sum(bp * bp, axis=-1)
            aqq = jnp.sum(bq * bq, axis=-1)
            apq = jnp.sum(bp * bq, axis=-1)
            theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
            c, s = jnp.cos(theta), jnp.sin(theta)
            rows = [[one if i == j else zero for j in range(3)] for i in range(3)]
            rows[p][p], rows[q][q] = c, c
            rows[p][q], rows[q][p] = s, -s
            g = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
            # pose math must not drop to bf16 on TPU (orthonormality to 1e-3
            # otherwise — seen as R[2,2]=1.0011 in demo poses)
            b = jnp.einsum("...ij,...jk->...ik", b, g, precision="highest")
            v = jnp.einsum("...ij,...jk->...ik", v, g, precision="highest")
    return b, v


def kabsch_rotation_3x3(h: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Kabsch rotation R = V diag(1,1,det(VU^T)) U^T for batched 3x3 H —
    closed form, no iterative SVD.

    Construction: one-sided Jacobi rotates H's columns orthogonal,
    accumulating V (det +1); the rotated columns are sigma_i * u_i.  Sort
    columns by descending norm (parity-fixed so V stays a rotation), build
    u1/u2 by normalized Gram-Schmidt with branchless degenerate fallbacks,
    u3 = u1 x u2.  With det(V) = +1 and a right-handed U, R = V U~^T *is*
    the det-corrected Kabsch rotation: the cross product flips u3 exactly
    when det(U_true) = -1, which is the diag(1,1,det) reflection fix.
    Degenerate ranks fall back to valid rotations (H -> 0 gives R -> I),
    matching the qdwh path's behavior on masked/empty batches.
    """
    bm, v = _jacobi_svd_one_sided(h)
    # sort columns descending by norm with a 3-element network; track parity
    # so a column swap does not silently turn V into a reflection
    parity = jnp.ones(h.shape[:-2], h.dtype)
    cols = [v[..., :, i] for i in range(3)]
    bcols = [bm[..., :, i] for i in range(3)]
    vals = [jnp.sum(bcols[i] * bcols[i], axis=-1) for i in range(3)]
    for i, j in ((0, 1), (1, 2), (0, 1)):
        swap = vals[i] < vals[j]
        vals[i], vals[j] = (
            jnp.where(swap, vals[j], vals[i]),
            jnp.where(swap, vals[i], vals[j]),
        )
        sw = swap[..., None]
        cols[i], cols[j] = (
            jnp.where(sw, cols[j], cols[i]),
            jnp.where(sw, cols[i], cols[j]),
        )
        parity = jnp.where(swap, -parity, parity)
    cols[2] = cols[2] * parity[..., None]
    v = jnp.stack(cols, axis=-1)

    b = jnp.einsum("...ij,...jk->...ik", h, v, precision="highest")

    def unit(x, fallback):
        n = jnp.linalg.norm(x, axis=-1, keepdims=True)
        ok = n > eps
        return jnp.where(ok, x / jnp.where(ok, n, 1.0), fallback)

    e1 = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], h.dtype), b[..., :, 0].shape)
    u1 = unit(b[..., :, 0], e1)
    # fallback for u2: the axis least aligned with u1, orthogonalized
    ax = jnp.argmin(jnp.abs(u1), axis=-1)
    alt = jnp.eye(3, dtype=h.dtype)[ax]
    alt = alt - jnp.sum(alt * u1, axis=-1, keepdims=True) * u1
    alt = alt / jnp.linalg.norm(alt, axis=-1, keepdims=True)
    b2 = b[..., :, 1]
    b2 = b2 - jnp.sum(b2 * u1, axis=-1, keepdims=True) * u1
    u2 = unit(b2, alt)
    u3 = jnp.cross(u1, u2)
    ut = jnp.stack([u1, u2, u3], axis=-2)  # U~^T
    return jnp.einsum("...ij,...jk->...ik", v, ut, precision="highest")


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
    import os

    kabsch_impl = os.environ.get("LCRNET_KABSCH", "auto")
    use_jacobi = (
        kabsch_impl == "jacobi"
        or (kabsch_impl == "auto" and jax.default_backend() == "tpu")
    )
    if use_jacobi:
        # closed-form Jacobi path: no qdwh `while` loop (~5 ms/forward of
        # the LGR candidate fleet), same det-corrected rotation
        r = kabsch_rotation_3x3(h)
    else:
        # CPU keeps the LAPACK SVD so pinned golden outputs stay bit-stable
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
