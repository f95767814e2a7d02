"""NetVLAD global-descriptor head (LOUPE-style), masked and batched.

Parity target: `experiments/lcrnet/modules/netvlad/NetVlad.py:12-201`
(NetVLADLoupe / NetVLADLoupe2 with LayerNorm normalization, intra-norm over
the cluster axis, flatten, 65536->256 projection, LayerNorm, sigmoid
GatingContext).  The reference's batch=1 variant and the masked batched
variant collapse into one masked implementation here — padded points get
-inf soft-assign logits, which is exactly NetVLADLoupe2's mask path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

_NEG_INF = -1.0e12

# TPU trap (NOTES.md): the default matmul precision rounds inputs to bf16.
# The place-identity signal rides on residuals ~1e-3 of the feature
# magnitude — below bf16 resolution — so every matmul here runs f32.
# (Measured: with default precision the triplet loss is frozen at exactly
# 2*margin and descriptor gradients vanish; with HIGHEST it trains.)
_HI = jax.lax.Precision.HIGHEST


def _scaled_normal(scale_dim):
    def init(key, shape, dtype=jnp.float32):
        return nn.initializers.normal(1.0 / math.sqrt(scale_dim))(key, shape, dtype)
    return init


class GatingContext(nn.Module):
    """Sigmoid context gating (reference `NetVlad.py:168-201`)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        w = self.param("gating_weights", _scaled_normal(self.dim), (self.dim, self.dim))
        gates = jnp.matmul(x, w, precision=_HI)
        gates = nn.LayerNorm(epsilon=1e-5)(gates)
        return x * nn.sigmoid(gates)


class NetVLAD(nn.Module):
    """Masked NetVLAD: (B, N, C) features + (B, N) mask -> (B, output_dim)."""

    feature_size: int = 1024
    cluster_size: int = 64
    output_dim: int = 256
    gating: bool = True

    @nn.compact
    def __call__(self, x, mask):
        b, n, c = x.shape
        cluster_w = self.param(
            "cluster_weights", _scaled_normal(self.feature_size), (c, self.cluster_size)
        )
        cluster_w2 = self.param(
            "cluster_weights2", _scaled_normal(self.feature_size), (1, c, self.cluster_size)
        )
        hidden_w = self.param(
            "hidden1_weights",
            _scaled_normal(self.feature_size),
            (self.cluster_size * c, self.output_dim),
        )

        activation = jnp.matmul(x, cluster_w, precision=_HI)  # (B, N, K)
        activation = nn.LayerNorm(epsilon=1e-5)(activation)
        activation = jnp.where(mask[..., None], activation, _NEG_INF)
        activation = nn.softmax(activation, axis=-1)
        activation = jnp.where(mask[..., None], activation, 0.0)

        a_sum = jnp.sum(activation, axis=-2, keepdims=True)  # (B, 1, K)
        a = a_sum * cluster_w2  # (B, C, K)

        vlad = jnp.einsum("bnk,bnc->bck", activation, x, precision=_HI)  # (B, C, K)
        vlad = vlad - a
        # intra-normalization over the feature axis (dim=1 in the reference)
        vlad = vlad / jnp.maximum(jnp.linalg.norm(vlad, axis=1, keepdims=True), 1e-6)
        # flatten (B, C, K) C-major (index = c*K + k), exactly the reference's
        # `vlad1.view(-1, cluster_size * feature_size)` on its (B, C, K)
        # tensor (NetVlad.py:148-149) — the row order of hidden1_weights
        # depends on it, and the converter maps that matrix unchanged
        vlad = vlad.reshape(b, c * self.cluster_size)
        vlad = vlad / jnp.maximum(jnp.linalg.norm(vlad, axis=1, keepdims=True), 1e-6)

        vlad = jnp.matmul(vlad, hidden_w, precision=_HI)
        vlad = nn.LayerNorm(epsilon=1e-5)(vlad)
        if self.gating:
            vlad = GatingContext(self.output_dim)(vlad)
        return vlad
