"""Coordinate grid construction and pose transforms.

Grid layout parity with the reference (train_mnist.py:315-320): x runs
-1 -> +1 left to right, y runs +1 -> -1 top to bottom, stacked as (HW, 2)
row-major in image order.

Rotation convention parity (train_mnist.py:54-59): the reference right-
multiplies row-vector coordinates by R = [[cos, sin], [-sin, cos]], i.e.

    out0 = x0*cos - x1*sin
    out1 = x0*sin + x1*cos

(a CCW rotation of the coordinate frame).  We compute it with elementwise
broadcasts instead of materialising (B, 2, 2) matrices — the 2x2 bmm is
MXU-hostile and pure overhead on TPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def coord_grid(n: int, m: int, dtype=np.float32) -> np.ndarray:
    """(HW, 2) coordinate array for an n-row, m-column image."""
    xgrid = np.linspace(-1, 1, m)
    ygrid = np.linspace(1, -1, n)
    x0, x1 = np.meshgrid(xgrid, ygrid)
    return np.stack([x0.ravel(), x1.ravel()], axis=1).astype(dtype)


def rotate_coords(x: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """x: (..., HW, 2) or (HW, 2); theta: (B,) -> (B, HW, 2)."""
    c = jnp.cos(theta)[:, None]
    s = jnp.sin(theta)[:, None]
    x0, x1 = x[..., 0], x[..., 1]
    return jnp.stack([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)


def translate_coords(x: jnp.ndarray, dx: jnp.ndarray) -> jnp.ndarray:
    """x: (B, HW, 2); dx: (B, 2) already scaled."""
    return x + dx[:, None, :]
