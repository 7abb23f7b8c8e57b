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


# ---------------------------------------------------------------------------
# prequantized-weight variant: the int8 weight copy is produced upstream
# (fused into the Adam update, train/optimizer_pallas.py), so neither the
# forward nor the backward spends a quantisation pass on the weight — the
# cost that made the naive int8 encoder a net loss in round 1.
# ---------------------------------------------------------------------------


def _qx(x, sx_static):
    """Quantize an activation: dynamic per-tensor max, or a STATIC scale
    when the caller knows a bound (tanh outputs are in [-1, 1] — the max
    pass over the (B, H) tensor disappears and the round fuses into the
    producing elementwise chain)."""
    if sx_static is None:
        return _q(x)
    inv = 127.0 / sx_static
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127
                 ).astype(jnp.int8)
    return q, jnp.float32(sx_static / 127.0)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def qlinear_pre(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                wq: jnp.ndarray, sw: jnp.ndarray,
                sx_static=None) -> jnp.ndarray:
    """x @ w + b on the int8 MXU using the PREQUANTIZED (wq, sw).

    ``w`` participates only in autodiff wiring (its cotangent is the int8
    dW); the forward consumes wq/sw, which are treated as data.
    ``sx_static``: known bound on |x| (e.g. 1.0 for tanh inputs) — skips
    the dynamic max pass."""
    del w
    xq, sx = _qx(x, sx_static)
    out = _dot8(xq, wq, (((1,), (0,)), ((), ()))) * (sx * sw[0, 0])
    return (out + b).astype(x.dtype)


def _pre_fwd(x, w, b, wq, sw, sx_static):
    # (nondiff_argnums keeps fwd's signature in primal order; only bwd
    # gets the static args prepended)
    xq, sx = _qx(x, sx_static)
    out = _dot8(xq, wq, (((1,), (0,)), ((), ()))) * (sx * sw[0, 0])
    return ((out + b).astype(x.dtype),
            (xq, sx, wq, sw, jnp.zeros((0,), x.dtype),
             jnp.zeros((0,), w.dtype)))


def _pre_bwd(sx_static, res, g):
    xq, sx, wq, sw, x_s, w_s = res
    gq, sg = _q(g)
    dx = _dot8(gq, wq, (((1,), (1,)), ((), ()))) * (sg * sw[0, 0])
    dw = _dot8(xq, gq, (((0,), (0,)), ((), ()))) * (sx * sg)
    db = jnp.sum(g.astype(jnp.float32), axis=0)
    return (dx.astype(x_s.dtype), dw.astype(w_s.dtype),
            db.astype(w_s.dtype), None, None)


qlinear_pre.defvjp(_pre_fwd, _pre_bwd)


# ---------------------------------------------------------------------------
# both sides prequantized: the input is CONSTANT DATA quantized once per
# dataset (the training images), so the per-step activation-quantisation
# pass over (B, n) disappears too, and no input cotangent exists.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def qlinear_pre_xq(xq: jnp.ndarray, sx: jnp.ndarray, w: jnp.ndarray,
                   b: jnp.ndarray, wq: jnp.ndarray,
                   sw: jnp.ndarray) -> jnp.ndarray:
    """(xq*sx) @ w + b on the int8 MXU, both operands prequantized.

    xq: (B, In) int8 data; sx/sw: (1, 1) scales; ``w`` is autodiff wiring
    only (dW attaches to it)."""
    del w
    out = _dot8(xq, wq, (((1,), (0,)), ((), ()))) * (sx[0, 0] * sw[0, 0])
    return (out + b).astype(b.dtype)


def _xq_fwd(xq, sx, w, b, wq, sw):
    out = _dot8(xq, wq, (((1,), (0,)), ((), ()))) * (sx[0, 0] * sw[0, 0])
    return ((out + b).astype(b.dtype),
            (xq, sx, jnp.zeros((0,), w.dtype)))


def _xq_bwd(res, g):
    xq, sx, w_s = res
    gq, sg = _q(g)
    dw = _dot8(xq, gq, (((0,), (0,)), ((), ()))) * (sx[0, 0] * sg)
    db = jnp.sum(g.astype(jnp.float32), axis=0)
    return (None, None, dw.astype(w_s.dtype), db.astype(w_s.dtype),
            None, None)


qlinear_pre_xq.defvjp(_xq_fwd, _xq_bwd)
