"""SpatialGenerator p(y|x,z) — the coordinate-conditioned MLP decoder.

Capability parity with /root/reference/spatial_vae/models.py:57-132:
``h = coord_linear(x) + latent_linear(z) [+ bilinear(x, z)]`` followed by
``act, [Linear(H,H)+act | ResidLinear]*(L-1), Linear(H, n_out), Sigmoid`` and
an optional softplus on the first output channel (models.py:129-130).
``expand_coords`` appends x^2, y^2, x*y to the 2-vector coordinate input
(models.py:99-102).

TPU-first design — the pose fold
--------------------------------
The reference materialises per-image 2x2 rotation matrices and bmm's them with
the (B, HW, 2) grid before the decoder (train_mnist.py:54-74).  On TPU that is
a tiny, MXU-hostile matmul.  Instead, for the plain in_dim=2 decoder we fold
sample -> rotate -> translate -> coord_linear algebraically into *per-image
effective first-layer weights*:

    x_rot0 = x0*cos(t) - x1*sin(t) + dx0
    x_rot1 = x0*sin(t) + x1*cos(t) + dx1
    h[b,p] = x_rot0*W0 + x_rot1*W1 + b + z[b] @ Wz
           = x0[p]*W0'[b] + x1[p]*W1'[b] + c'[b]

with  W0' = cos*W0 + sin*W1,  W1' = -sin*W0 + cos*W1,
      c'  = dx0*W0 + dx1*W1 + b + z @ Wz.

The per-image weights cost one (B,Z)x(Z,H) GEMM plus VPU broadcasts; the
(B,HW,H) hidden activations are then two rank-1-style fused multiply-adds —
no 2x2 matmuls, no (B,HW,2) rotated grid in HBM.  This identity is exact, so
the folded path is used for training whenever ``expand_coords``/``bilinear``
are off; the generic path remains for those variants and for parity tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from spatialvae_tpu.core.config import SpatialGeneratorConfig
from spatialvae_tpu.nn import (
    bilinear_apply,
    bilinear_init,
    linear_apply,
    linear_init,
    mlp_init,
    resolve_activation,
)


def spatial_generator_init(key: jax.Array, cfg: SpatialGeneratorConfig,
                           dtype=jnp.float32):
    kc, kl, kb, kh = jax.random.split(key, 4)
    params = {"coord": linear_init(kc, cfg.in_dim, cfg.hidden_dim, dtype=dtype)}
    if cfg.latent_dim > 0:
        params["latent"] = linear_init(kl, cfg.latent_dim, cfg.hidden_dim,
                                       bias=False, dtype=dtype)
        if cfg.bilinear:
            params["bilinear"] = bilinear_init(kb, cfg.in_dim, cfg.latent_dim,
                                               cfg.hidden_dim, dtype=dtype)
    # hidden->hidden layers (num_layers-1 of them) + head (H, n_out)
    dims = [cfg.hidden_dim] * cfg.num_layers + [cfg.n_out]
    params["layers"] = mlp_init(kh, dims, resid_hidden=cfg.resid, dtype=dtype)
    return params


def _constrain_hidden(h: jax.Array) -> jax.Array:
    """Pixel-axis (sequence-parallel analogue) sharding constraint on the
    (B, HW, H) hidden activations; no-op on a single chip."""
    from spatialvae_tpu.parallel.sharding import constrain_decoder_hidden
    return constrain_decoder_hidden(h)


def expand_coords(x: jax.Array) -> jax.Array:
    """(..., 2) -> (..., 5): [x, y, x^2, y^2, x*y].  models.py:99-102."""
    xy = (x[..., 0] * x[..., 1])[..., None]
    return jnp.concatenate([x, x * x, xy], axis=-1)


def _tail(params, cfg: SpatialGeneratorConfig, h: jax.Array) -> jax.Array:
    """act -> hidden stack -> head -> sigmoid -> optional softplus(ch 0)."""
    act = resolve_activation(cfg.activation)
    x = act(h)
    for p in params["layers"][:-1]:
        y = linear_apply(p, x)
        if cfg.resid:
            y = y + x
        x = act(y)
    y = jax.nn.sigmoid(linear_apply(params["layers"][-1], x))
    if cfg.softplus:
        y = jnp.concatenate(
            [jax.nn.softplus(y[..., :1]), y[..., 1:]], axis=-1)
    return y


def spatial_generator_apply(params, cfg: SpatialGeneratorConfig,
                            x: jax.Array, z: Optional[jax.Array]) -> jax.Array:
    """Generic path.  x: (B, HW, 2) or (HW, 2); z: (B, latent_dim) or None.

    Returns (B, HW, n_out).
    """
    if x.ndim < 3:
        x = x[None]
    if cfg.expand_coords:
        x = expand_coords(x)
    h = linear_apply(params["coord"], x)             # (B, HW, H)
    if cfg.latent_dim > 0 and z is not None:
        if z.ndim < 2:
            z = z[None]
        h = h + (z @ params["latent"]["w"])[:, None, :]
        if cfg.bilinear:
            zb = jnp.broadcast_to(z[:, None, :], x.shape[:2] + (z.shape[-1],))
            h = h + bilinear_apply(params["bilinear"], x, zb)
    h = _constrain_hidden(h)
    return _tail(params, cfg, h)


# ---------------------------------------------------------------------------
# folded fast path (training hot loop)
# ---------------------------------------------------------------------------


def can_fold(cfg: SpatialGeneratorConfig) -> bool:
    return not cfg.expand_coords and not cfg.bilinear


def fold_pose_into_first_layer(params, cfg: SpatialGeneratorConfig,
                               theta: Optional[jax.Array],
                               dx: Optional[jax.Array],
                               z: Optional[jax.Array]):
    """Fold per-image rotation/translation/latent into first-layer weights.

    theta: (B,) or None; dx: (B, 2) (already scaled) or None; z: (B, Z) or
    None.  Returns (w0, w1, c) each (B, H) such that
    ``h[b, p] = x0[p]*w0[b] + x1[p]*w1[b] + c[b]`` equals the reference's
    coord_linear(rotate(x)+dx) + latent_linear(z).
    """
    assert can_fold(cfg)
    if theta is None and dx is None and z is None:
        # nothing carries a batch dimension to fold over — a pose-free,
        # latent-free decode should pass z=(B, 0) to pick the batch size
        raise ValueError(
            "fold_pose_into_first_layer needs at least one of theta/dx/z "
            "to carry the batch dimension; pass z of shape (B, 0) for a "
            "pose-free latent_dim=0 decode")
    w = params["coord"]["w"]                          # (2, H)
    w0, w1 = w[0], w[1]
    if theta is not None:
        c, s = jnp.cos(theta)[:, None], jnp.sin(theta)[:, None]
        ew0 = c * w0 + s * w1                         # (B, H)
        ew1 = -s * w0 + c * w1
    else:
        one = jnp.ones((dx.shape[0] if dx is not None else z.shape[0], 1),
                       dtype=w.dtype)
        ew0, ew1 = one * w0, one * w1
    bias = params["coord"]["b"]
    if dx is not None:
        bias = bias + dx[:, :1] * w0 + dx[:, 1:2] * w1
    else:
        bias = jnp.broadcast_to(bias, ew0.shape)
    if cfg.latent_dim > 0 and z is not None:
        bias = bias + z @ params["latent"]["w"]       # (B,Z)x(Z,H) GEMM
    return ew0, ew1, bias


def spatial_generator_apply_folded(params, cfg: SpatialGeneratorConfig,
                                   coords: jax.Array,
                                   theta: Optional[jax.Array],
                                   dx: Optional[jax.Array],
                                   z: Optional[jax.Array]) -> jax.Array:
    """Fast path: coords is the *untransformed* (HW, 2) grid.

    Exactly equivalent to ``spatial_generator_apply(params, cfg,
    rotate(coords)+dx, z)`` for in_dim=2 decoders.
    """
    w0, w1, c = fold_pose_into_first_layer(params, cfg, theta, dx, z)
    x0 = coords[:, 0]                                 # (HW,)
    x1 = coords[:, 1]
    # (B, HW, H) via two broadcast FMAs — XLA fuses these with the activation.
    h = (x0[None, :, None] * w0[:, None, :]
         + x1[None, :, None] * w1[:, None, :]
         + c[:, None, :])
    h = _constrain_hidden(h)
    return _tail(params, cfg, h)
