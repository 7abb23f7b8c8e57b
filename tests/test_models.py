"""Module-shape/equivalence tests vs float64 oracles (SURVEY.md section 4.2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialvae_tpu.core.config import (
    InferenceConfig,
    SpatialGeneratorConfig,
    VanillaGeneratorConfig,
)
from spatialvae_tpu.models import (
    inference_apply,
    inference_init,
    spatial_generator_apply,
    spatial_generator_init,
    vanilla_generator_apply,
    vanilla_generator_init,
)
from spatialvae_tpu.models.spatial import (
    can_fold,
    spatial_generator_apply_folded,
)
from spatialvae_tpu.transforms.coords import coord_grid

from . import oracles


def _np(t):
    return jax.tree_util.tree_map(np.asarray, t)


@pytest.mark.parametrize("resid", [False, True])
@pytest.mark.parametrize("activation", ["tanh", "relu", "leakyrelu"])
def test_inference_network_matches_oracle(resid, activation):
    cfg = InferenceConfig(n=64, latent_dim=5, hidden_dim=32, num_layers=3,
                          activation=activation, resid=resid)
    key = jax.random.PRNGKey(0)
    params = inference_init(key, cfg)
    y = jax.random.uniform(jax.random.PRNGKey(1), (7, 64))
    mu, ls = inference_apply(params, cfg, y)
    mu0, ls0 = oracles.inference_net(_np(params), cfg, np.asarray(y))
    assert mu.shape == (7, 5) and ls.shape == (7, 5)
    np.testing.assert_allclose(np.asarray(mu), mu0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ls), ls0, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("resid", [False, True])
@pytest.mark.parametrize("expand", [False, True])
@pytest.mark.parametrize("bilinear", [False, True])
@pytest.mark.parametrize("softplus", [False, True])
def test_spatial_generator_matches_oracle(resid, expand, bilinear, softplus):
    cfg = SpatialGeneratorConfig(latent_dim=3, hidden_dim=24, n_out=2,
                                 num_layers=3, softplus=softplus, resid=resid,
                                 expand_coords=expand, bilinear=bilinear)
    params = spatial_generator_init(jax.random.PRNGKey(2), cfg)
    x = np.asarray(coord_grid(6, 6))
    xb = np.broadcast_to(x[None], (4,) + x.shape)
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (4, 3)))
    y = spatial_generator_apply(params, cfg, jnp.asarray(xb), jnp.asarray(z))
    y0 = oracles.spatial_generator(_np(params), cfg, xb, z)
    assert y.shape == (4, 36, 2)
    np.testing.assert_allclose(np.asarray(y), y0, rtol=1e-5, atol=1e-5)


def test_spatial_generator_no_latent():
    cfg = SpatialGeneratorConfig(latent_dim=0, hidden_dim=16, num_layers=2)
    params = spatial_generator_init(jax.random.PRNGKey(0), cfg)
    assert "latent" not in params
    x = jnp.asarray(coord_grid(4, 4))[None]
    y = spatial_generator_apply(params, cfg, x, None)
    assert y.shape == (1, 16, 1)


def test_folded_path_equals_generic():
    """The pose fold must be exactly the rotate->translate->decode pipeline."""
    cfg = SpatialGeneratorConfig(latent_dim=4, hidden_dim=32, n_out=1,
                                 num_layers=2)
    assert can_fold(cfg)
    params = spatial_generator_init(jax.random.PRNGKey(5), cfg)
    coords = jnp.asarray(coord_grid(8, 8))
    b = 5
    theta = jax.random.normal(jax.random.PRNGKey(6), (b,))
    dx = 0.1 * jax.random.normal(jax.random.PRNGKey(7), (b, 2))
    z = jax.random.normal(jax.random.PRNGKey(8), (b, 4))

    y_fold = spatial_generator_apply_folded(params, cfg, coords, theta, dx, z)

    c, s = jnp.cos(theta)[:, None], jnp.sin(theta)[:, None]
    x0, x1 = coords[:, 0], coords[:, 1]
    xr = jnp.stack([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)
    xr = xr + dx[:, None, :]
    y_ref = spatial_generator_apply(params, cfg, xr, z)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("softplus", [False, True])
@pytest.mark.parametrize("resid", [False, True])
def test_vanilla_generator_matches_oracle(softplus, resid):
    cfg = VanillaGeneratorConfig(n=25, latent_dim=3, hidden_dim=16, n_out=2,
                                 num_layers=3, softplus=softplus, resid=resid)
    params = vanilla_generator_init(jax.random.PRNGKey(9), cfg)
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(10), (4, 3)))
    y = vanilla_generator_apply(params, cfg, None, jnp.asarray(z))
    y0 = oracles.vanilla_generator(_np(params), cfg, z)
    assert y.shape == (4, 25, 2)
    np.testing.assert_allclose(np.asarray(y), y0, rtol=1e-5, atol=1e-5)


def test_linear_init_matches_torch_distribution():
    """Weight/bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) like nn.Linear."""
    from spatialvae_tpu.nn import linear_init

    p = linear_init(jax.random.PRNGKey(0), 400, 300)
    bound = 1.0 / np.sqrt(400)
    w = np.asarray(p["w"])
    assert w.shape == (400, 300)
    assert w.min() >= -bound and w.max() <= bound
    # roughly uniform: std of U(-b, b) is b/sqrt(3)
    np.testing.assert_allclose(w.std(), bound / np.sqrt(3), rtol=0.05)
    b = np.asarray(p["b"])
    assert b.min() >= -bound and b.max() <= bound
