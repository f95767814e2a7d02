"""Vote layer: per-node offset regression with norm clipping.

Parity target: `experiments/lcrnet/modules/vote/vote.py:112-183`
(shared MLP [2C, C] of Linear+LayerNorm+ReLU, then a 3-dim offset head whose
L2 norm is clipped at MAX_TRANSLATE_RANGE).  The NMS companion lives in
`lcrnet_tpu.ops.nms` (device-resident parallel greedy).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class VoteLayer(nn.Module):
    input_feats_dim: int
    max_translate_range: float = 4.2

    @nn.compact
    def __call__(self, xyz, feats):
        """xyz (B, N, 3), feats (B, N, C) -> shifted xyz (B, N, 3)."""
        h = nn.Dense(self.input_feats_dim * 2)(feats)
        h = nn.LayerNorm(epsilon=1e-5)(h)
        h = nn.relu(h)
        h = nn.Dense(self.input_feats_dim)(h)
        h = nn.LayerNorm(epsilon=1e-5)(h)
        h = nn.relu(h)
        offsets = nn.Dense(3)(h)
        norm = jnp.sqrt(jnp.sum(offsets * offsets, axis=-1, keepdims=True) + 1e-12)
        alpha = jnp.where(
            norm > self.max_translate_range, self.max_translate_range / jnp.maximum(norm, 1e-9), 1.0
        )
        return xyz + offsets * alpha
