"""Golden-math tests for the unified ELBO (SURVEY.md section 4.1)."""

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
    inference_init,
    spatial_generator_init,
    vanilla_generator_init,
)
from spatialvae_tpu.objectives import ElboConfig, elbo_minibatch
from spatialvae_tpu.transforms.coords import coord_grid

from . import oracles


def _np(t):
    return jax.tree_util.tree_map(np.asarray, t)


def _setup(z_dim=2, rotate=True, translate=True, n=8, m=8, channels=1,
           n_out=1, p_kw=None):
    inf_dim = z_dim + (1 if rotate else 0) + (2 if translate else 0)
    q_cfg = InferenceConfig(n=n * m * channels, latent_dim=inf_dim,
                            hidden_dim=20, num_layers=2)
    p_cfg = SpatialGeneratorConfig(latent_dim=z_dim, hidden_dim=20,
                                   n_out=n_out, num_layers=2, **(p_kw or {}))
    kq, kp, ky, kr = jax.random.split(jax.random.PRNGKey(0), 4)
    q_params = inference_init(kq, q_cfg)
    p_params = spatial_generator_init(kp, p_cfg)
    shape = (4, n * m, channels) if channels > 1 else (4, n * m)
    y = jax.random.uniform(ky, shape)
    r = jax.random.normal(kr, (4, inf_dim))
    coords = jnp.asarray(coord_grid(n, m))
    return q_cfg, p_cfg, q_params, p_params, y, r, coords


@pytest.mark.parametrize("mean_penalty", [True, False])
@pytest.mark.parametrize("use_fold", [True, False])
def test_bernoulli_elbo_matches_oracle(mean_penalty, use_fold):
    """mnist variant: BCE recon, theta KL with/without the mean term."""
    q_cfg, p_cfg, qp, pp, y, r, coords = _setup()
    ecfg = ElboConfig(rotate=True, translate=True, dx_scale=0.1,
                      theta_prior=np.pi / 4, theta_mean_penalty=mean_penalty,
                      likelihood="bernoulli", use_fold=use_fold)
    elbo, logp, kl, _ = elbo_minibatch(qp, pp, q_cfg, p_cfg, ecfg, coords, y,
                                       None, noise=r)
    e0, l0, k0 = oracles.elbo_reference(_np(qp), q_cfg, _np(pp), p_cfg, ecfg,
                                        np.asarray(coords), np.asarray(y),
                                        np.asarray(r))
    np.testing.assert_allclose(float(elbo), e0, rtol=1e-4)
    np.testing.assert_allclose(float(logp), l0, rtol=1e-4)
    np.testing.assert_allclose(float(kl), k0, rtol=1e-4)


def test_gaussian_elbo_matches_oracle():
    """particles variant: gaussian recon, no mean penalty."""
    q_cfg, p_cfg, qp, pp, y, r, coords = _setup()
    ecfg = ElboConfig(theta_prior=np.pi, theta_mean_penalty=False,
                      likelihood="gaussian")
    elbo, logp, kl, _ = elbo_minibatch(qp, pp, q_cfg, p_cfg, ecfg, coords, y,
                                       None, noise=r)
    e0, l0, k0 = oracles.elbo_reference(_np(qp), q_cfg, _np(pp), p_cfg, ecfg,
                                        np.asarray(coords), np.asarray(y),
                                        np.asarray(r))
    np.testing.assert_allclose(float(elbo), e0, rtol=1e-4)
    np.testing.assert_allclose(float(logp), l0, rtol=1e-4)
    np.testing.assert_allclose(float(kl), k0, rtol=1e-4)


def test_colored_noise_elbo_matches_oracle():
    """--fit-noise: n_out=2, interleaved mu/logvar split (reference quirk)."""
    q_cfg, p_cfg, qp, pp, y, r, coords = _setup(n_out=2)
    ecfg = ElboConfig(theta_prior=np.pi, likelihood="colored")
    elbo, logp, kl, _ = elbo_minibatch(qp, pp, q_cfg, p_cfg, ecfg, coords, y,
                                       None, noise=r)
    e0, l0, k0 = oracles.elbo_reference(_np(qp), q_cfg, _np(pp), p_cfg, ecfg,
                                        np.asarray(coords), np.asarray(y),
                                        np.asarray(r))
    np.testing.assert_allclose(float(elbo), e0, rtol=1e-4)
    np.testing.assert_allclose(float(kl), k0, rtol=1e-4)


def test_colored_fused_matches_xla_path(monkeypatch):
    """The colored (--fit-noise) family rides the fused int8 loss kernel
    since round 5; the fused elbo must match the XLA decode-then-loss
    path, with and without a pixel mask, and the non-interleaved variant
    (a library extension) must keep the XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    from spatialvae_tpu.objectives.elbo import fused_loss_active

    # i8/tile isolates layout correctness from int4 forward noise; the
    # default i4dw1 stack is covered by test_kernels_int8 family tests
    monkeypatch.setenv("SPATIALVAE_INT4_GRADS", "i8")
    monkeypatch.setenv("SPATIALVAE_GSCALE", "tile")
    n = m = 32
    q_cfg, p_cfg, qp, pp, y, r, coords = _setup(n=n, m=m, n_out=2)
    yg, xg = np.ogrid[:n, :m]
    dist = np.sqrt((n / 2 - yg) ** 2 + (m / 2 - xg) ** 2)
    mask = jnp.asarray((dist < min(n, m) / 2).ravel().astype(np.float32))

    ecfg = ElboConfig(theta_prior=np.pi, likelihood="colored",
                      fused=True, int8=True)
    assert fused_loss_active(ecfg, p_cfg, n * m, 4)
    # the kernel implements the reference's interleaved split only
    assert not fused_loss_active(
        ElboConfig(theta_prior=np.pi, likelihood="colored", fused=True,
                   int8=True, fit_noise_interleaved=False),
        p_cfg, n * m, 4)

    plain = ElboConfig(theta_prior=np.pi, likelihood="colored")
    for mk in (None, mask):
        with pltpu.force_tpu_interpret_mode():
            elbo, logp, kl, _ = elbo_minibatch(qp, pp, q_cfg, p_cfg, ecfg,
                                               coords, y, None, noise=r,
                                               mask=mk)
        e0, l0, k0, _ = elbo_minibatch(qp, pp, q_cfg, p_cfg, plain,
                                       coords, y, None, noise=r, mask=mk)
        np.testing.assert_allclose(float(logp), float(l0), rtol=2e-3)
        np.testing.assert_allclose(float(kl), float(k0), rtol=1e-5)
        np.testing.assert_allclose(float(elbo), float(e0), rtol=2e-3)


def test_multichannel_elbo_matches_oracle():
    """galaxy variant: (B, HW, C) targets, BCE x (HW*C)."""
    q_cfg, p_cfg, qp, pp, y, r, coords = _setup(channels=3, n_out=3)
    ecfg = ElboConfig(theta_prior=np.pi, likelihood="bernoulli", channels=3)
    elbo, logp, kl, _ = elbo_minibatch(qp, pp, q_cfg, p_cfg, ecfg, coords, y,
                                       None, noise=r)
    e0, l0, k0 = oracles.elbo_reference(_np(qp), q_cfg, _np(pp), p_cfg, ecfg,
                                        np.asarray(coords), np.asarray(y),
                                        np.asarray(r))
    np.testing.assert_allclose(float(elbo), e0, rtol=1e-4)


def test_mask_elbo_matches_oracle():
    """circular pixel mask: masked pixels contribute nothing."""
    q_cfg, p_cfg, qp, pp, y, r, coords = _setup()
    n = m = 8
    yg, xg = np.ogrid[:n, :m]
    dist = np.sqrt((n / 2 - yg) ** 2 + (m / 2 - xg) ** 2)
    mask = (dist < min(n, m) / 2).ravel().astype(np.float32)
    ecfg = ElboConfig(likelihood="gaussian")
    elbo, logp, kl, _ = elbo_minibatch(qp, pp, q_cfg, p_cfg, ecfg, coords, y,
                                       None, noise=r, mask=jnp.asarray(mask))
    e0, l0, k0 = oracles.elbo_reference(_np(qp), q_cfg, _np(pp), p_cfg, ecfg,
                                        np.asarray(coords), np.asarray(y),
                                        np.asarray(r), mask=mask)
    np.testing.assert_allclose(float(elbo), e0, rtol=1e-4)


def test_bernoulli_mask_fused_matches_manual():
    """bernoulli + mask rides the fused int8 loss kernel since round 4
    (the mask became a kernel operand for both families) and must compute
    the same masked BCE as the explicit decode.  The CLIs never combine
    them (mask is particles/gaussian-only, train_particles.py:126-133)
    but the library API allows it."""
    from jax.experimental.pallas import tpu as pltpu

    from spatialvae_tpu.objectives.elbo import fused_loss_active

    n = m = 32
    q_cfg, p_cfg, qp, pp, y, r, coords = _setup(n=n, m=m)
    yg, xg = np.ogrid[:n, :m]
    dist = np.sqrt((n / 2 - yg) ** 2 + (m / 2 - xg) ** 2)
    mask = (dist < min(n, m) / 2).ravel().astype(np.float32)
    ecfg = ElboConfig(likelihood="bernoulli", fused=True, int8=True)
    # without the mask this config takes the fused kernel path
    assert fused_loss_active(ecfg, p_cfg, n * m, 4)
    with pltpu.force_tpu_interpret_mode():
        elbo, logp, kl, _ = elbo_minibatch(qp, pp, q_cfg, p_cfg, ecfg,
                                           coords, y, None, noise=r,
                                           mask=jnp.asarray(mask))
    # oracle: decode explicitly, masked BCE summed over unmasked pixels
    _, _, _, y_hat = elbo_minibatch(qp, pp, q_cfg, p_cfg,
                                    ElboConfig(likelihood="bernoulli"),
                                    coords, y, None, noise=r,
                                    want_y_hat=True)
    yh = np.asarray(y_hat).reshape(4, -1)
    yy = np.asarray(y).reshape(4, -1)
    per = -(yy * np.clip(np.log(yh), -100, None)
            + (1 - yy) * np.clip(np.log1p(-yh), -100, None))
    logp0 = -np.sum(per * mask[None, :]) / 4
    np.testing.assert_allclose(float(logp), logp0, rtol=1e-4)


def test_bce_gradient_finite_at_sigmoid_saturation():
    """f32 sigmoid saturates to exactly 1.0/0.0 for |logit| beyond ~17/104;
    autodiff of the clamped logs NaN'd the whole gradient there (0 * inf
    through the log transpose), while torch's binary_cross_entropy
    backward stays finite and vanishes through the sigmoid chain.  The
    custom VJP must match torch's gradient exactly, saturation included,
    and keep the -100-clamped value parity."""
    torch = pytest.importorskip("torch")

    from spatialvae_tpu.objectives.elbo import _bce_sum

    logits = np.array([-104.0, -30.0, -17.0, -3.0, 0.0, 3.0, 17.0, 30.0,
                       104.0], np.float32)
    y = np.array([1.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0], np.float32)
    assert float(jax.nn.sigmoid(jnp.float32(104.0))) == 1.0   # saturated
    assert float(jax.nn.sigmoid(jnp.float32(-104.0))) == 0.0

    def loss(h):
        return _bce_sum(jax.nn.sigmoid(h), jnp.asarray(y))

    g = np.asarray(jax.grad(loss)(jnp.asarray(logits)))
    assert np.isfinite(g).all()

    th = torch.tensor(logits, requires_grad=True)
    tl = torch.nn.functional.binary_cross_entropy(
        torch.sigmoid(th), torch.tensor(y), reduction="sum")
    tl.backward()
    np.testing.assert_allclose(g, th.grad.numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(loss(jnp.asarray(logits))), float(tl),
                               rtol=1e-5)


def test_masked_bernoulli_gradient_finite_at_saturation():
    """A masked-OUT saturated pixel must not NaN the gradient either (the
    mask multiply happens after the logs)."""
    from spatialvae_tpu.objectives.elbo import _bce_elems

    y_hat = jnp.asarray([1.0, 0.5], jnp.float32)
    y = jnp.asarray([0.0, 1.0], jnp.float32)
    mask = jnp.asarray([0.0, 1.0], jnp.float32)

    def loss(p):
        return jnp.sum(_bce_elems(p, y) * mask)

    g = np.asarray(jax.grad(loss)(y_hat))
    assert np.isfinite(g).all()
    assert g[0] == 0.0                         # masked out


def test_gaussian_mask_broadcasts_over_channels():
    """(HW,) mask on multi-channel gaussian data broadcasts pixel-major,
    like the bernoulli branch (library extension — the reference masks
    grayscale only)."""
    q_cfg, p_cfg, qp, pp, y, r, coords = _setup(channels=3, n_out=3)
    n = m = 8
    yg, xg = np.ogrid[:n, :m]
    dist = np.sqrt((n / 2 - yg) ** 2 + (m / 2 - xg) ** 2)
    mask = (dist < min(n, m) / 2).ravel().astype(np.float32)
    ecfg = ElboConfig(likelihood="gaussian", channels=3)
    elbo, logp, kl, _ = elbo_minibatch(qp, pp, q_cfg, p_cfg, ecfg, coords, y,
                                       None, noise=r, mask=jnp.asarray(mask))
    e0, l0, k0 = oracles.elbo_reference(_np(qp), q_cfg, _np(pp), p_cfg, ecfg,
                                        np.asarray(coords), np.asarray(y),
                                        np.asarray(r), mask=mask)
    np.testing.assert_allclose(float(elbo), e0, rtol=1e-4)


def test_fold_all_none_raises():
    """The folded API needs a batch carrier; all-None used to crash with
    AttributeError deep in the fold."""
    from spatialvae_tpu.models.spatial import fold_pose_into_first_layer

    p_cfg = SpatialGeneratorConfig(latent_dim=0, hidden_dim=8, num_layers=1)
    pp = spatial_generator_init(jax.random.PRNGKey(0), p_cfg)
    with pytest.raises(ValueError, match="batch dimension"):
        fold_pose_into_first_layer(pp, p_cfg, None, None, None)
    # the documented escape hatch: a (B, 0) z carries the batch
    w0, w1, c = fold_pose_into_first_layer(pp, p_cfg, None, None,
                                           jnp.zeros((3, 0)))
    assert w0.shape == (3, 8)


def test_offset_reinjection_matches_oracle():
    """rotation-augment offsets are added back to theta before the pose."""
    q_cfg, p_cfg, qp, pp, y, r, coords = _setup()
    offsets = np.random.RandomState(0).uniform(0, 2 * np.pi, size=4
                                               ).astype(np.float32)
    ecfg = ElboConfig(likelihood="gaussian")
    elbo, _, _, _ = elbo_minibatch(qp, pp, q_cfg, p_cfg, ecfg, coords, y,
                                   None, noise=r, offsets=jnp.asarray(offsets))
    e0, _, _ = oracles.elbo_reference(_np(qp), q_cfg, _np(pp), p_cfg, ecfg,
                                      np.asarray(coords), np.asarray(y),
                                      np.asarray(r), offsets=offsets)
    np.testing.assert_allclose(float(elbo), e0, rtol=1e-4)


def test_z_scale_zero_zeroes_unstructured_latents():
    """--z-delay curriculum: z_scale=0 must remove z influence on decode."""
    q_cfg, p_cfg, qp, pp, y, r, coords = _setup()
    ecfg = ElboConfig(likelihood="gaussian")
    e1, _, _, _ = elbo_minibatch(qp, pp, q_cfg, p_cfg, ecfg, coords, y, None,
                                 noise=r, z_scale=0.0)
    e0, _, _ = oracles.elbo_reference(_np(qp), q_cfg, _np(pp), p_cfg, ecfg,
                                      np.asarray(coords), np.asarray(y),
                                      np.asarray(r), z_scale=0.0)
    np.testing.assert_allclose(float(e1), e0, rtol=1e-4)


def test_vanilla_elbo_matches_oracle():
    z_dim = 3
    n = m = 6
    q_cfg = InferenceConfig(n=n * m, latent_dim=z_dim, hidden_dim=16,
                            num_layers=2)
    p_cfg = VanillaGeneratorConfig(n=n * m, latent_dim=z_dim, hidden_dim=16,
                                   num_layers=2)
    kq, kp, ky, kr = jax.random.split(jax.random.PRNGKey(1), 4)
    qp = inference_init(kq, q_cfg)
    pp = vanilla_generator_init(kp, p_cfg)
    y = jax.random.uniform(ky, (4, n * m))
    r = jax.random.normal(kr, (4, z_dim))
    coords = jnp.asarray(coord_grid(n, m))
    ecfg = ElboConfig(vanilla=True, likelihood="bernoulli",
                      theta_mean_penalty=True, theta_prior=np.pi / 4)
    elbo, _, _, _ = elbo_minibatch(qp, pp, q_cfg, p_cfg, ecfg, coords, y,
                                   None, noise=r)
    e0, _, _ = oracles.elbo_reference(_np(qp), q_cfg, _np(pp), p_cfg, ecfg,
                                      np.asarray(coords), np.asarray(y),
                                      np.asarray(r))
    np.testing.assert_allclose(float(elbo), e0, rtol=1e-4)


def test_coord_grid_layout():
    """y axis runs +1 -> -1 top to bottom (train_mnist.py:315-320)."""
    g = coord_grid(3, 3)
    np.testing.assert_allclose(g[0], [-1.0, 1.0])    # top-left
    np.testing.assert_allclose(g[2], [1.0, 1.0])     # top-right
    np.testing.assert_allclose(g[6], [-1.0, -1.0])   # bottom-left
    np.testing.assert_allclose(g[4], [0.0, 0.0])     # center
