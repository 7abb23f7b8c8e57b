"""int8 fused decoder: approximate-correctness vs the f32 folded path."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from spatialvae_tpu.core.config import SpatialGeneratorConfig
from spatialvae_tpu.kernels.fused_decoder_int8 import (
    can_fuse_int8,
    fused_spatial_generator_int8,
)
from spatialvae_tpu.models import spatial_generator_init
from spatialvae_tpu.models.spatial import spatial_generator_apply_folded
from spatialvae_tpu.transforms.coords import coord_grid


def _setup():
    cfg = SpatialGeneratorConfig(latent_dim=5, hidden_dim=32, n_out=3,
                                 num_layers=2)
    params = spatial_generator_init(jax.random.PRNGKey(0), cfg)
    coords = jnp.asarray(coord_grid(16, 16))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    theta = jax.random.normal(k1, (4,))
    dx = 0.1 * jax.random.normal(k2, (4, 2))
    z = jax.random.normal(k3, (4, 5))
    return cfg, params, coords, theta, dx, z


def test_can_fuse_int8_gating():
    good = SpatialGeneratorConfig(latent_dim=2, hidden_dim=500, num_layers=2)
    assert can_fuse_int8(good, 4096)
    assert not can_fuse_int8(
        SpatialGeneratorConfig(latent_dim=2, num_layers=3), 4096)


def test_int8_forward_close_to_f32():
    cfg, params, coords, theta, dx, z = _setup()
    with pltpu.force_tpu_interpret_mode():
        y_q = fused_spatial_generator_int8(params, cfg, coords, theta, dx, z)
    y_f = spatial_generator_apply_folded(params, cfg, coords, theta, dx, z)
    # int8 hidden layer: outputs within ~1% absolute after the sigmoid
    err = np.abs(np.asarray(y_q) - np.asarray(y_f))
    assert err.max() < 2e-2, err.max()
    assert err.mean() < 2e-3, err.mean()


def test_int8_gradients_close_to_f32():
    cfg, params, coords, theta, dx, z = _setup()

    def loss_q(params, theta, dx, z):
        y = fused_spatial_generator_int8(params, cfg, coords, theta, dx, z)
        return jnp.sum(jnp.sin(3.0 * y))

    def loss_f(params, theta, dx, z):
        y = spatial_generator_apply_folded(params, cfg, coords, theta, dx, z)
        return jnp.sum(jnp.sin(3.0 * y))

    with pltpu.force_tpu_interpret_mode():
        g_q = jax.grad(loss_q, argnums=(0, 1, 2, 3))(params, theta, dx, z)
    g_f = jax.grad(loss_f, argnums=(0, 1, 2, 3))(params, theta, dx, z)

    # gradients are approximate; direction must agree (cosine > 0.99)
    for a, b in zip(jax.tree_util.tree_leaves(g_q),
                    jax.tree_util.tree_leaves(g_f)):
        a = np.asarray(a).ravel()
        b = np.asarray(b).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        if denom > 1e-8:
            cos = float(a @ b / denom)
            assert cos > 0.99, cos
