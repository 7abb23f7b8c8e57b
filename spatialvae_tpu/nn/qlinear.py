"""int8 linear layer with a custom int8 backward (XLA-level).

Used by the experimental --int8-decoder mode to quantize the encoder's
large GEMMs as well (the q first layer is the single largest weight in the
system).  Per-tensor symmetric scales; the backward quantizes the incoming
cotangent dynamically and runs both gradient contractions on the int8 MXU.

The input cotangent is propagated (needed when an augmented view feeds the
encoder), also via an int8 contraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_P = jax.lax.Precision.DEFAULT


def _q(x):
    s = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0 + 1e-30
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127
                 ).astype(jnp.int8)
    return q, s


def _dot8(aq, bq, dims):
    return jax.lax.dot_general(
        aq, bq, dims, preferred_element_type=jnp.int32,
        precision=_P).astype(jnp.float32)


@jax.custom_vjp
def qlinear(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x: (B, In) @ w: (In, Out) + b, computed on the int8 MXU."""
    xq, sx = _q(x)
    wq, sw = _q(w)
    out = _dot8(xq, wq, (((1,), (0,)), ((), ()))) * (sx * sw)
    return (out + b).astype(x.dtype)


def _fwd(x, w, b):
    xq, sx = _q(x)
    wq, sw = _q(w)
    out = _dot8(xq, wq, (((1,), (0,)), ((), ()))) * (sx * sw)
    # zero-size dtype sentinels keep the residual pytree array-only
    return ((out + b).astype(x.dtype),
            (xq, sx, wq, sw, jnp.zeros((0,), x.dtype),
             jnp.zeros((0,), w.dtype)))


def _bwd(res, g):
    xq, sx, wq, sw, x_s, w_s = res
    gq, sg = _q(g)
    dx = _dot8(gq, wq, (((1,), (1,)), ((), ()))) * (sg * sw)
    dw = _dot8(xq, gq, (((0,), (0,)), ((), ()))) * (sx * sg)
    db = jnp.sum(g.astype(jnp.float32), axis=0)
    return dx.astype(x_s.dtype), dw.astype(w_s.dtype), db.astype(w_s.dtype)


qlinear.defvjp(_fwd, _bwd)
