"""Fused Pallas decoder vs the XLA folded path (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from spatialvae_tpu.core.config import SpatialGeneratorConfig
from spatialvae_tpu.kernels.fused_decoder import (
    can_fuse_decoder,
    fused_spatial_generator,
)
from spatialvae_tpu.models import spatial_generator_init
from spatialvae_tpu.models.spatial import spatial_generator_apply_folded
from spatialvae_tpu.transforms.coords import coord_grid


def _setup(n_out=3, h=32, n=16, m=16, b=4, z_dim=5, num_layers=2,
           resid=False):
    cfg = SpatialGeneratorConfig(latent_dim=z_dim, hidden_dim=h, n_out=n_out,
                                 num_layers=num_layers, resid=resid)
    params = spatial_generator_init(jax.random.PRNGKey(0), cfg)
    coords = jnp.asarray(coord_grid(n, m))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    theta = jax.random.normal(k1, (b,))
    dx = 0.1 * jax.random.normal(k2, (b, 2))
    z = jax.random.normal(k3, (b, z_dim))
    return cfg, params, coords, theta, dx, z


def test_can_fuse_decoder_gating():
    good = SpatialGeneratorConfig(latent_dim=2, hidden_dim=500, num_layers=2)
    assert can_fuse_decoder(good, 4096)
    assert can_fuse_decoder(good, 1600)            # padded (particles 40x40)
    assert not can_fuse_decoder(good, 100)         # too small
    assert can_fuse_decoder(
        SpatialGeneratorConfig(latent_dim=2, num_layers=4), 4096)
    assert can_fuse_decoder(
        SpatialGeneratorConfig(latent_dim=2, num_layers=2, resid=True), 4096)
    for bad in (
        SpatialGeneratorConfig(latent_dim=2, num_layers=7),
        SpatialGeneratorConfig(latent_dim=2, num_layers=2,
                               expand_coords=True),
        SpatialGeneratorConfig(latent_dim=2, num_layers=2, bilinear=True),
    ):
        assert not can_fuse_decoder(bad, 4096)


def test_fused_deep_and_resid_forward_matches_xla():
    for num_layers, resid in [(3, False), (4, False), (2, True), (3, True)]:
        cfg, params, coords, theta, dx, z = _setup(num_layers=num_layers,
                                                   resid=resid)
        with pltpu.force_tpu_interpret_mode():
            y_fused = fused_spatial_generator(params, cfg, coords, theta,
                                              dx, z)
        y_ref = spatial_generator_apply_folded(params, cfg, coords, theta,
                                               dx, z)
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"L={num_layers} resid={resid}")


def test_fused_deep_gradients_match_xla():
    cfg, params, coords, theta, dx, z = _setup(num_layers=3, resid=True)

    def loss_fused(params, theta, dx, z):
        y = fused_spatial_generator(params, cfg, coords, theta, dx, z)
        return jnp.sum(jnp.sin(3.0 * y))

    def loss_ref(params, theta, dx, z):
        y = spatial_generator_apply_folded(params, cfg, coords, theta, dx, z)
        return jnp.sum(jnp.sin(3.0 * y))

    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(
            params, theta, dx, z)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(params, theta, dx, z)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_forward_matches_xla():
    cfg, params, coords, theta, dx, z = _setup()
    with pltpu.force_tpu_interpret_mode():
        y_fused = fused_spatial_generator(params, cfg, coords, theta, dx, z)
    y_ref = spatial_generator_apply_folded(params, cfg, coords, theta, dx, z)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_forward_padded_hw():
    """Non-tile-aligned pixel counts go through the padded path."""
    cfg, params, _, theta, dx, z = _setup(n=20, m=20)   # HW=400
    coords = jnp.asarray(coord_grid(20, 20))
    with pltpu.force_tpu_interpret_mode():
        y_fused = fused_spatial_generator(params, cfg, coords, theta, dx, z)
    y_ref = spatial_generator_apply_folded(params, cfg, coords, theta, dx, z)
    assert y_fused.shape == y_ref.shape == (4, 400, 3)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_forward_softplus_and_no_pose():
    cfg, params, coords, theta, dx, z = _setup()
    import dataclasses

    cfg_sp = dataclasses.replace(cfg, softplus=True)
    with pltpu.force_tpu_interpret_mode():
        y1 = fused_spatial_generator(params, cfg_sp, coords, theta, dx, z)
        y2 = fused_spatial_generator(params, cfg, coords, None, None, z)
    r1 = spatial_generator_apply_folded(params, cfg_sp, coords, theta, dx, z)
    r2 = spatial_generator_apply_folded(params, cfg, coords, None, None, z)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(r1), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(r2), rtol=1e-5,
                               atol=1e-5)


def test_fused_gradients_match_xla():
    """Custom-VJP backward (recompute + grid accumulation) must match XLA
    autodiff through the folded path for every input."""
    cfg, params, coords, theta, dx, z = _setup()

    def loss_fused(params, theta, dx, z):
        y = fused_spatial_generator(params, cfg, coords, theta, dx, z)
        return jnp.sum(jnp.sin(3.0 * y))       # nontrivial cotangent

    def loss_ref(params, theta, dx, z):
        y = spatial_generator_apply_folded(params, cfg, coords, theta, dx, z)
        return jnp.sum(jnp.sin(3.0 * y))

    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(
            params, theta, dx, z)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(params, theta, dx, z)

    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    assert len(flat_f) == len(flat_r)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_gradients_residual_and_recompute_variants(monkeypatch):
    """The VJP's adaptive activation handling (round 5): the residual
    backward (default at test shapes) and the recompute backward (forced
    by shrinking _RESIDUAL_BYTES_MAX) must produce the same gradients —
    the recompute's MXU operands are bit-identical; only the tanh'
    factors gain f32 precision."""
    import spatialvae_tpu.kernels.fused_decoder as fd

    for resid, layers in ((False, 2), (True, 3)):
        cfg, params, coords, theta, dx, z = _setup(num_layers=layers,
                                                   resid=resid)

        def loss(params, theta, dx, z, cfg=cfg):
            y = fused_spatial_generator(params, cfg, coords, theta, dx, z)
            return jnp.sum(jnp.sin(3.0 * y))

        with pltpu.force_tpu_interpret_mode():
            g_res = jax.grad(loss, argnums=(0, 1, 2, 3))(
                params, theta, dx, z)
            monkeypatch.setattr(fd, "_RESIDUAL_BYTES_MAX", 0)
            g_rec = jax.grad(loss, argnums=(0, 1, 2, 3))(
                params, theta, dx, z)
            monkeypatch.undo()
        for a, b in zip(jax.tree_util.tree_leaves(g_res),
                        jax.tree_util.tree_leaves(g_rec)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_int8_decoder_recompute_variant_matches_residual(monkeypatch):
    """Same adaptive check for the int8 decoder.  The residual stores a1
    in bf16 while the recompute rebuilds it in f32, so the tanh' factor
    and the per-tile gradient-quant scale differ at bf16 resolution —
    that flips a few int8 rounding boundaries, hence int8-style bands
    (max-rel vs max|ref| + cosine) rather than elementwise closeness."""
    import spatialvae_tpu.kernels.fused_decoder as fd
    from spatialvae_tpu.kernels.fused_decoder_int8 import (
        fused_spatial_generator_int8,
    )

    cfg, params, coords, theta, dx, z = _setup()

    def loss(params, theta, dx, z):
        y = fused_spatial_generator_int8(params, cfg, coords, theta, dx, z)
        return jnp.sum(jnp.sin(3.0 * y))

    with pltpu.force_tpu_interpret_mode():
        g_res = jax.grad(loss, argnums=(0, 1, 2, 3))(params, theta, dx, z)
        monkeypatch.setattr(fd, "_RESIDUAL_BYTES_MAX", 0)
        g_rec = jax.grad(loss, argnums=(0, 1, 2, 3))(params, theta, dx, z)
        monkeypatch.undo()
    for a, b in zip(jax.tree_util.tree_leaves(g_res),
                    jax.tree_util.tree_leaves(g_rec)):
        a = np.asarray(a)
        b = np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
        assert rel < 5e-2, rel
        denom = np.linalg.norm(a.ravel()) * np.linalg.norm(b.ravel())
        if denom > 1e-8:
            assert float(a.ravel() @ b.ravel() / denom) > 0.999
