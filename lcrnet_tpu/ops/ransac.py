"""Correspondence RANSAC pose estimator, TPU-native.

Capability parity with the reference's open3d path
(`utils/utils/open3d.py:145-175` registration_with_ransac_from_correspondences,
used by `experiments/registration/eval.py:176-185` with
distance_threshold=0.3, ransac_n=4, num_iterations=50000 from
`config_reg.py:69-73`) — without open3d: every RANSAC hypothesis runs as one
batched weighted-Procrustes fit (a (H, 3, 3) SVD fleet on the MXU) and the
inlier counting is a blocked dense residual sweep, so the whole estimator is
a single jitted program instead of a sequential CPU loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from lcrnet_tpu.ops.procrustes import weighted_procrustes
from lcrnet_tpu.ops.transform import apply_transform


@partial(
    jax.jit,
    static_argnames=("num_samples", "num_iterations", "refine_steps", "chunk"),
)
def correspondence_ransac(
    src_points: jnp.ndarray,
    ref_points: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    distance_threshold: float = 0.3,
    num_samples: int = 4,
    num_iterations: int = 50000,
    refine_steps: int = 1,
    chunk: int = 512,
) -> jnp.ndarray:
    """Estimate the src -> ref rigid transform from noisy correspondences.

    Args:
      src_points/ref_points: (C, 3) correspondence endpoints.
      valid: (C,) bool correspondence validity (padding mask).
      key: PRNG key for hypothesis sampling.
      distance_threshold: inlier residual radius (reference 0.3 m).
      num_samples: points per hypothesis (reference ransac_n = 4).
      num_iterations: hypothesis count H (reference 50000).
      refine_steps: Procrustes refits on the winning inlier set (open3d
        polishes the best model on its inlier correspondences once).

    Returns: (4, 4) transform.
    """
    c = src_points.shape[0]
    valid_f = valid.astype(src_points.dtype)
    # sample only valid correspondences (uniform over the unpadded set);
    # an all-invalid set (a legitimately failed pair dump) falls back to
    # uniform sampling so the program stays finite instead of feeding
    # jax.random.choice a zero probability vector
    total = jnp.sum(valid_f)
    probs = jnp.where(total > 0, valid_f / jnp.maximum(total, 1.0), 1.0 / c)
    idx = jax.random.choice(
        key, c, shape=(num_iterations, num_samples), replace=True, p=probs
    )
    hyp_src = src_points[idx]  # (H, n, 3)
    hyp_ref = ref_points[idx]

    # one batched Kabsch fleet for all hypotheses
    transforms = weighted_procrustes(hyp_src, hyp_ref, None)  # (H, 4, 4)

    # blocked inlier counting: (chunk, C) residuals per pass
    thresh2 = jnp.asarray(distance_threshold**2, src_points.dtype)

    def count_chunk(ts):
        aligned = apply_transform(src_points[None, :, :], ts)  # (chunk, C, 3)
        res2 = jnp.sum((ref_points[None, :, :] - aligned) ** 2, axis=-1)
        inl = jnp.logical_and(res2 < thresh2, valid[None, :])
        return jnp.sum(inl.astype(jnp.int32), axis=1)

    pad = (-num_iterations) % chunk
    ts_pad = (
        jnp.concatenate([transforms, jnp.broadcast_to(jnp.eye(4, dtype=transforms.dtype), (pad, 4, 4))])
        if pad
        else transforms
    )
    counts = lax.map(count_chunk, ts_pad.reshape(-1, chunk, 4, 4)).reshape(-1)
    if pad:
        counts = counts.at[-pad:].set(-1)
    best = jnp.argmax(counts)
    estimated = transforms[best]

    # polish: refit on the inlier set of the best hypothesis
    for _ in range(refine_steps):
        aligned = apply_transform(src_points, estimated)
        res2 = jnp.sum((ref_points - aligned) ** 2, axis=-1)
        w = jnp.logical_and(res2 < thresh2, valid).astype(src_points.dtype)
        estimated = weighted_procrustes(src_points, ref_points, w)
    return estimated
