"""Vector angle utilities.

Parity target: `experiments/lcrnet/modules/ops/vector_angle.py:5-34`
(rad/deg conversion, angle between vectors via atan2 of cross/dot — the
atan2 form is stable near 0 and pi, unlike arccos).
"""

from __future__ import annotations

import jax.numpy as jnp


def rad2deg(rad: jnp.ndarray) -> jnp.ndarray:
    return jnp.degrees(rad)


def deg2rad(deg: jnp.ndarray) -> jnp.ndarray:
    return jnp.radians(deg)


def vector_angle(x: jnp.ndarray, y: jnp.ndarray, degrees: bool = False) -> jnp.ndarray:
    """Angle between (*, 3) vector pairs via atan2(|cross|, dot)."""
    cross = jnp.linalg.norm(jnp.cross(x, y), axis=-1)
    dot = jnp.sum(x * y, axis=-1)
    angle = jnp.arctan2(cross, dot)
    return jnp.degrees(angle) if degrees else angle
