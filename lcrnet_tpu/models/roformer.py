"""3D-RoFormer: rotary self-attention + vanilla cross-attention over nodes.

Parity targets:
  - `experiments/lcrnet/modules/thdroformer/thdroformer_linear.py:12-96`
    (in_proj 1024->128, interleaved ['self','cross'] x num_layers, out_proj
    128->256)
  - `modules/thdroformer/Rotary3DPosEmb.py:27-38` (theta = Linear(3,128) ->
    Linear(128,64), no activation)
  - `modules/thdroformer/rpetransformer.py:41-54` (rotary rotation with
    interleaved pairs; theta nearest-neighbor upsampled x2 so pair (2i, 2i+1)
    shares theta_i), `:57-220` (RPE attention layer: post-norm residual,
    linear out, FFN d->2d->d)
  - `modules/thdroformer/vanilla_transformer.py:13-145` (cross attention)

TPU notes: all attention is over the static node budget (<= 768 per cloud),
so a (B, H, N, N) score tensor is tiny; padded nodes are masked at -inf in
the softmax (the reference's ragged layout has no padding — masking is the
padded-layout equivalent, not a semantic change).  Matmuls run in bf16-safe
fp32 accumulation via preferred_element_type.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn
from jax import lax

_NEG_INF = -1.0e9


def rotate_half_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 2i, 2i+1) pairs -> (-x_{2i+1}, x_{2i}) (reference
    `Rotary3DPosEmb.py:14-17`)."""
    x2 = x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2))
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1)
    return rot.reshape(x.shape)


def apply_rotary(x: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rotate per-head features by theta (theta repeated x2 along the feature
    axis, nearest-style: [t0, t0, t1, t1, ...])."""
    theta2 = jnp.repeat(theta, 2, axis=-1)
    return x * jnp.cos(theta2) + rotate_half_interleaved(x) * jnp.sin(theta2)


class LinearPosEmbedding(nn.Module):
    """xyz -> theta (B, N, hidden/2): two stacked linears, no activation."""

    hidden_dim: int

    @nn.compact
    def __call__(self, points):
        x = nn.Dense(self.hidden_dim)(points)
        return nn.Dense(self.hidden_dim // 2)(x)


def _attention(q, k, v, key_masks, topk_ratio: Optional[float] = None):
    """Scaled dot-product attention (B, H, N, C); key_masks (B, M) True=valid.

    Optional top-k sparse softmax per the reference's `dynamic_attention`
    (`rpetransformer.py:19-39`): softmax over only the k = ratio*N largest
    scores per row (disabled in the shipped config)."""
    d = q.shape[-1]
    scores = jnp.einsum("bhnc,bhmc->bhnm", q, k) / d ** 0.5
    scores = jnp.where(key_masks[:, None, None, :], scores, _NEG_INF)
    if topk_ratio is not None:
        kk = max(1, int(scores.shape[-1] * topk_ratio))
        kth = lax.top_k(scores, kk)[0][..., -1:]
        scores = jnp.where(scores >= kth, scores, _NEG_INF)
    attn = nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhnm,bhmc->bhnc", attn, v)
    return out, attn


def _split_heads(x, num_heads):
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, n, c = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * c)


class RPEAttentionLayer(nn.Module):
    """Rotary self-attention + post-norm residual (reference
    `rpetransformer.py:110-141`)."""

    d_model: int
    num_heads: int
    topk_ratio: Optional[float] = None

    @nn.compact
    def __call__(self, x, theta, masks):
        q = _split_heads(nn.Dense(self.d_model)(x), self.num_heads)
        k = _split_heads(nn.Dense(self.d_model)(x), self.num_heads)
        v = _split_heads(nn.Dense(self.d_model)(x), self.num_heads)
        # theta: (B, N, d_model/2) -> per-head (B, H, N, d_head/2)
        theta_h = _split_heads(theta, self.num_heads)
        q = apply_rotary(q, theta_h)
        k = apply_rotary(k, theta_h)
        hidden, _ = _attention(q, k, v, masks, self.topk_ratio)
        hidden = nn.Dense(self.d_model)(_merge_heads(hidden))
        return nn.LayerNorm(epsilon=1e-5)(hidden + x)


class CrossAttentionLayer(nn.Module):
    """Vanilla cross-attention + post-norm residual (reference
    `vanilla_transformer.py:92-119`)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, x, memory, memory_masks):
        q = _split_heads(nn.Dense(self.d_model)(x), self.num_heads)
        k = _split_heads(nn.Dense(self.d_model)(memory), self.num_heads)
        v = _split_heads(nn.Dense(self.d_model)(memory), self.num_heads)
        hidden, _ = _attention(q, k, v, memory_masks)
        hidden = nn.Dense(self.d_model)(_merge_heads(hidden))
        return nn.LayerNorm(epsilon=1e-5)(hidden + x)


class AttentionOutput(nn.Module):
    """FFN d -> 2d -> d with post-norm residual (reference
    `vanilla_transformer.py:13-28`)."""

    d_model: int

    @nn.compact
    def __call__(self, x):
        hidden = nn.Dense(self.d_model * 2)(x)
        hidden = nn.relu(hidden)
        hidden = nn.Dense(self.d_model)(hidden)
        return nn.LayerNorm(epsilon=1e-5)(hidden + x)


class ThDRoFormer(nn.Module):
    """Interleaved self/cross transformer over node pairs.

    Operates on (2P, N, C) pair-major cloud batches (even index = ref/pos,
    odd = src/anc of each pair).  Self-attention runs batched over all
    clouds; cross-attention pairs even with odd clouds.
    """

    input_dim: int
    hidden_dim: int
    output_dim: int
    num_heads: int
    num_layers: int
    topk_ratio: Optional[float] = None

    @nn.compact
    def __call__(self, points, feats, masks, return_theta: bool = False):
        """Args: points (2P, N, 3), feats (2P, N, C_in), masks (2P, N)."""
        b = feats.shape[0]
        theta = LinearPosEmbedding(self.hidden_dim)(points)  # (2P, N, hidden/2)
        x = nn.Dense(self.hidden_dim)(feats)
        for _ in range(self.num_layers):
            x = RPEAttentionLayer(self.hidden_dim, self.num_heads, self.topk_ratio)(
                x, theta, masks
            )
            x = AttentionOutput(self.hidden_dim)(x)
            # sequential cross-attention (reference `rpetransformer.py:205-208`:
            # cloud 1 attends to the *already updated* cloud 0)
            cross = CrossAttentionLayer(self.hidden_dim, self.num_heads)
            ffn = AttentionOutput(self.hidden_dim)
            x0 = ffn(cross(x[0::2], x[1::2], masks[1::2]))
            x1 = ffn(cross(x[1::2], x0, masks[0::2]))
            x = jnp.stack([x0, x1], axis=1).reshape(x.shape)
        out = nn.Dense(self.output_dim)(x)
        if return_theta:
            return out, theta
        return out
