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


def test_qlinear_matches_f32():
    from spatialvae_tpu.nn.qlinear import qlinear

    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    x = jax.random.uniform(k1, (32, 64))
    w = 0.1 * jax.random.normal(k2, (64, 48))
    b = 0.1 * jax.random.normal(k3, (48,))

    out_q = qlinear(x, w, b)
    out_f = x @ w + b
    err = np.abs(np.asarray(out_q) - np.asarray(out_f))
    scale = np.abs(np.asarray(out_f)).max()
    assert err.max() / scale < 2e-2

    def loss_q(x, w, b):
        return jnp.sum(jnp.sin(qlinear(x, w, b)))

    def loss_f(x, w, b):
        return jnp.sum(jnp.sin(x @ w + b))

    gq = jax.grad(loss_q, argnums=(0, 1, 2))(x, w, b)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(gq, gf):
        a = np.asarray(a).ravel()
        c = np.asarray(c).ravel()
        cos = a @ c / (np.linalg.norm(a) * np.linalg.norm(c))
        assert cos > 0.995, cos


def test_inference_apply_q8_close_to_f32():
    from spatialvae_tpu.core.config import InferenceConfig
    from spatialvae_tpu.models import inference_init
    from spatialvae_tpu.models.inference import (
        inference_apply,
        inference_apply_q8,
    )

    cfg = InferenceConfig(n=64, latent_dim=5, hidden_dim=32, num_layers=2)
    params = inference_init(jax.random.PRNGKey(0), cfg)
    y = jax.random.uniform(jax.random.PRNGKey(1), (8, 64))
    mu_q, ls_q = inference_apply_q8(params, cfg, y)
    mu_f, ls_f = inference_apply(params, cfg, y)
    np.testing.assert_allclose(np.asarray(mu_q), np.asarray(mu_f), atol=3e-2)
    np.testing.assert_allclose(np.asarray(ls_q), np.asarray(ls_f), atol=3e-2)
