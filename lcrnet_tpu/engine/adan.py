"""Adan optimizer (Adaptive Nesterov Momentum) as an optax transform.

Capability parity with the vendored `experiments/lcrnet/adan.py:22-289`
(used for loop-detection training).  Implemented from the Adan update rule
(Xie et al., 2022, arXiv:2208.06677):

  m_t = (1-b1) m_{t-1} + b1 g_t
  v_t = (1-b2) v_{t-1} + b2 (g_t - g_{t-1})
  n_t = (1-b3) n_{t-1} + b3 (g_t + (1-b2)(g_t - g_{t-1}))^2
  update = (m_t + (1-b2) v_t) / (sqrt(n_hat) + eps), with bias correction
  weight decay: proximal-style x <- x / (1 + lr*wd) after the step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class AdanState(NamedTuple):
    count: jnp.ndarray
    m: optax.Updates
    v: optax.Updates
    n: optax.Updates
    prev_grad: optax.Updates


def scale_by_adan(b1: float = 0.02, b2: float = 0.08, b3: float = 0.01,
                  eps: float = 1e-8) -> optax.GradientTransformation:
    """Adan scaling; betas follow the paper's (1-beta) convention used by the
    reference defaults (betas=(0.98, 0.92, 0.99) -> b=(0.02, 0.08, 0.01))."""

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdanState(
            count=jnp.zeros([], jnp.int32),
            m=zeros,
            v=jax.tree.map(jnp.zeros_like, params),
            n=jax.tree.map(jnp.zeros_like, params),
            prev_grad=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params=None):
        count = state.count + 1
        is_first = state.count == 0
        diff = jax.tree.map(
            lambda g, pg: jnp.where(is_first, jnp.zeros_like(g), g - pg),
            grads,
            state.prev_grad,
        )
        m = jax.tree.map(lambda mm, g: (1 - b1) * mm + b1 * g, state.m, grads)
        v = jax.tree.map(lambda vv, d: (1 - b2) * vv + b2 * d, state.v, diff)
        n = jax.tree.map(
            lambda nn, g, d: (1 - b3) * nn + b3 * (g + (1 - b2) * d) ** 2,
            state.n,
            grads,
            diff,
        )
        c = count.astype(jnp.float32)
        bc1 = 1 - (1 - b1) ** c
        bc2 = 1 - (1 - b2) ** c
        bc3 = 1 - (1 - b3) ** c
        updates = jax.tree.map(
            lambda mm, vv, nn: -(mm / bc1 + (1 - b2) * vv / bc2)
            / (jnp.sqrt(nn / bc3) + eps),
            m,
            v,
            n,
        )
        return updates, AdanState(count=count, m=m, v=v, n=n, prev_grad=grads)

    return optax.GradientTransformation(init_fn, update_fn)


def adan(learning_rate, weight_decay: float = 0.0, **kw) -> optax.GradientTransformation:
    txs = [scale_by_adan(**kw)]
    if weight_decay:
        txs.append(optax.add_decayed_weights(-weight_decay))
    txs.append(optax.scale_by_learning_rate(learning_rate, flip_sign=False))
    return optax.chain(*txs)
