"""Structure-of-arrays 3-vector helpers.

TPU tiles pad the minor array dimension to 128 lanes, so ``(N, 3)`` ray
arrays waste ~42x the memory bandwidth of three separate ``(N,)``
component arrays.  Every hot path in photon_tpu therefore carries rays as
component tuples ``(x, y, z)`` of shape ``(N,)`` and converts to/from the
``(N, 3)`` ``RayBundle`` layout only at API boundaries.
"""
from __future__ import annotations

import jax.numpy as jnp


def from_rows(a):
    """(N, 3) -> (x, y, z) component views."""
    return a[:, 0], a[:, 1], a[:, 2]


def to_rows(x, y, z):
    """(x, y, z) -> (N, 3)."""
    return jnp.stack([x, y, z], axis=-1)


def dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def norm(x, y, z):
    return jnp.sqrt(x * x + y * y + z * z)


def normalize(x, y, z):
    inv = 1.0 / norm(x, y, z)
    return x * inv, y * inv, z * inv


def scale_add(x, y, z, s, dx, dy, dz):
    """(x, y, z) + s * (dx, dy, dz), s broadcastable to (N,)."""
    return x + s * dx, y + s * dy, z + s * dz
