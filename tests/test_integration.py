"""ELBO-trajectory integration test (SURVEY.md section 4.5): a short
fixed-seed training run on structured synthetic data must improve the ELBO
monotonically across epochs."""

import numpy as np

import jax.numpy as jnp

from spatialvae_tpu.core.config import InferenceConfig, SpatialGeneratorConfig
from spatialvae_tpu.data import ArrayDataset
from spatialvae_tpu.objectives import ElboConfig
from spatialvae_tpu.train import Trainer, TrainConfig
from spatialvae_tpu.transforms.coords import coord_grid


def _rotated_bars(n_images=240, n=12):
    """Synthetic dataset: a bright bar at a random rotation per image."""
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[:n, :n].astype(np.float32)
    cx = cy = (n - 1) / 2.0
    out = np.zeros((n_images, n, n), dtype=np.float32)
    for i in range(n_images):
        t = rng.uniform(0, 2 * np.pi)
        d = np.abs(np.cos(t) * (yy - cy) - np.sin(t) * (xx - cx))
        out[i] = np.exp(-(d ** 2))
    return out.reshape(n_images, -1)


def test_elbo_improves_over_epochs():
    n = 12
    data = _rotated_bars(n=n)
    q_cfg = InferenceConfig(n=n * n, latent_dim=2 + 3, hidden_dim=64,
                            num_layers=2)
    p_cfg = SpatialGeneratorConfig(latent_dim=2, hidden_dim=64, num_layers=2)
    ecfg = ElboConfig(theta_prior=np.pi, theta_mean_penalty=True,
                      likelihood="bernoulli", dx_scale=0.1)
    tcfg = TrainConfig(minibatch_size=40, learning_rate=1e-3, num_epochs=6,
                       seed=0, image_shape=(n, n))
    trainer = Trainer(q_cfg, p_cfg, ecfg, tcfg, coord_grid(n, n))
    dataset = ArrayDataset(jnp.asarray(data))

    elbos = []
    for epoch in range(6):
        elbo, gen_loss, kl = trainer.train_epoch(dataset, epoch,
                                                 progress=False)
        assert np.isfinite(elbo)
        elbos.append(elbo)

    # total improvement and a mostly monotone trajectory
    assert elbos[-1] > elbos[0] + 1.0, elbos
    assert sum(b > a for a, b in zip(elbos, elbos[1:])) >= 4, elbos


def test_epoch_determinism_with_seed():
    """Same seed -> identical epoch metrics (deterministic RNG plumbing)."""
    n = 8
    rng = np.random.RandomState(1)
    data = rng.rand(64, n * n).astype(np.float32)

    def run():
        q_cfg = InferenceConfig(n=n * n, latent_dim=5, hidden_dim=16,
                                num_layers=2)
        p_cfg = SpatialGeneratorConfig(latent_dim=2, hidden_dim=16,
                                       num_layers=2)
        ecfg = ElboConfig(likelihood="bernoulli", theta_prior=np.pi)
        tcfg = TrainConfig(minibatch_size=32, num_epochs=2, seed=7,
                           image_shape=(n, n))
        t = Trainer(q_cfg, p_cfg, ecfg, tcfg, coord_grid(n, n))
        d = ArrayDataset(jnp.asarray(data))
        return [t.train_epoch(d, e, progress=False) for e in range(2)]

    a = run()
    b = run()
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
