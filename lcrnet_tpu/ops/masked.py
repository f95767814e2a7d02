"""Masked reductions and fixed-capacity selection helpers.

These are the static-shape building blocks that replace the reference's
data-dependent shapes (variable correspondence counts, nonzero() extraction,
threshold sweeps).  Everything returns fixed-size arrays plus masks.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

NEG_INF = -1.0e12


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None, eps: float = 1e-12):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), eps)


def masked_min(x: jnp.ndarray, mask: jnp.ndarray, axis=None, big: float = 1.0e12):
    return jnp.min(jnp.where(mask, x, big), axis=axis)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis=None, big: float = 1.0e12):
    return jnp.max(jnp.where(mask, x, -big), axis=axis)


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1):
    logits = jnp.where(mask, logits, NEG_INF)
    return jax_nn_softmax(logits, axis=axis)


def jax_nn_softmax(x, axis=-1):
    x_max = jnp.max(x, axis=axis, keepdims=True)
    ex = jnp.exp(x - lax.stop_gradient(x_max))
    return ex / jnp.sum(ex, axis=axis, keepdims=True)


def masked_top_k(scores: jnp.ndarray, mask: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-k over the last axis, honoring a validity mask.

    Returns (values, indices, valid): invalid entries are pushed to the tail
    and reported with valid=False.  The selection itself is a fixed-shape
    `lax.top_k` — the TPU replacement for the reference's nonzero()/topk on
    data-dependent sizes.
    """
    neg = jnp.where(mask, scores, NEG_INF)
    values, indices = lax.top_k(neg, k)
    valid = values > NEG_INF / 2
    return values, indices, valid
