"""Library API round-trip: save checkpoints -> load -> encode/decode."""

import numpy as np

import jax

from spatialvae_tpu.api import SpatialVae
from spatialvae_tpu.core.config import InferenceConfig, SpatialGeneratorConfig
from spatialvae_tpu.models import inference_init, spatial_generator_init
from spatialvae_tpu.train.checkpoint import save_model


def test_api_roundtrip(tmp_path):
    n = m = 8
    z_dim = 3
    q_cfg = InferenceConfig(n=n * m, latent_dim=z_dim + 3, hidden_dim=16,
                            num_layers=2)
    p_cfg = SpatialGeneratorConfig(latent_dim=z_dim, hidden_dim=16,
                                   num_layers=2)
    kq, kp = jax.random.split(jax.random.PRNGKey(0))
    qp = inference_init(kq, q_cfg)
    pp = spatial_generator_init(kp, p_cfg)
    gen = tmp_path / "x_generator_epoch1.sav"
    inf = tmp_path / "x_inference_epoch1.sav"
    save_model(str(gen), "generator", pp, p_cfg)
    save_model(str(inf), "inference", qp, q_cfg)

    model = SpatialVae.load(str(gen), str(inf), image_shape=(n, m))
    assert model.pose_dims == 3

    y = jax.random.uniform(jax.random.PRNGKey(1), (4, n * m))
    z_mu, z_ls = model.encode(y)
    assert z_mu.shape == (4, z_dim + 3)

    out = model.decode(z_mu[:, 3:])
    assert out.shape == (4, n * m, 1)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))

    rec = model.reconstruct(y, jax.random.PRNGKey(2))
    assert rec.shape == (4, n * m, 1)
    canon = model.reconstruct_canonical(y, jax.random.PRNGKey(3))
    assert canon.shape == (4, n * m, 1)
    samples = model.sample(5, jax.random.PRNGKey(4))
    assert samples.shape == (5, n * m, 1)


def test_api_vanilla_roundtrip(tmp_path):
    from spatialvae_tpu.core.config import VanillaGeneratorConfig
    from spatialvae_tpu.models import vanilla_generator_init
    import numpy as _np

    n = m = 6
    z_dim = 2
    q_cfg = InferenceConfig(n=n * m, latent_dim=z_dim, hidden_dim=8,
                            num_layers=2)
    p_cfg = VanillaGeneratorConfig(n=n * m, latent_dim=z_dim, hidden_dim=8,
                                   num_layers=2)
    kq, kp = jax.random.split(jax.random.PRNGKey(5))
    save_model(str(tmp_path / "g.sav"), "generator",
               vanilla_generator_init(kp, p_cfg), p_cfg)
    save_model(str(tmp_path / "i.sav"), "inference",
               inference_init(kq, q_cfg), q_cfg)
    model = SpatialVae.load(str(tmp_path / "g.sav"), str(tmp_path / "i.sav"),
                            image_shape=(n, m))
    assert model.vanilla and model.pose_dims == 0
    y = jax.random.uniform(jax.random.PRNGKey(6), (3, n * m))
    rec = model.reconstruct(y, jax.random.PRNGKey(7))
    assert rec.shape == (3, n * m, 1)
    s = model.sample(2, jax.random.PRNGKey(8))
    assert s.shape == (2, n * m, 1)
    assert _np.all(_np.isfinite(_np.asarray(s)))

def test_api_honors_persisted_elbo_semantics(tmp_path):
    """A model trained with non-default pose/ELBO flags (--dx-scale 0.5,
    --fit-noise) must reconstruct through the API exactly as the trainer
    does — the checkpoint carries the ElboConfig (round-1 weak #3)."""
    from spatialvae_tpu.objectives import ElboConfig
    from spatialvae_tpu.train import Trainer, TrainConfig
    from spatialvae_tpu.transforms.coords import coord_grid
    from spatialvae_tpu.train.checkpoint import save_trained_models

    n = m = 8
    z_dim = 2
    q_cfg = InferenceConfig(n=n * m, latent_dim=z_dim + 3, hidden_dim=16,
                            num_layers=2)
    p_cfg = SpatialGeneratorConfig(latent_dim=z_dim, hidden_dim=16,
                                   num_layers=2, n_out=2)   # fit-noise head
    ecfg = ElboConfig(rotate=True, translate=True, dx_scale=0.5,
                      theta_prior=1.0, likelihood="colored")
    tcfg = TrainConfig(minibatch_size=8, num_epochs=1, seed=3,
                       image_shape=(n, m))
    trainer = Trainer(q_cfg, p_cfg, ecfg, tcfg, coord_grid(n, m))

    class _DS:
        y = jax.random.uniform(jax.random.PRNGKey(11), (16, n * m))
        ctf = None

        def __len__(self):
            return 16

    trainer.train_epoch(_DS(), 0, progress=False)
    ok = save_trained_models("run", 0, 1, 1, str(tmp_path),
                             trainer.state.params["p"], p_cfg,
                             trainer.state.params["q"], q_cfg,
                             async_write=False, elbo=ecfg,
                             image_shape=(n, m))
    assert ok

    model = SpatialVae.load(str(tmp_path / "run_generator_epoch1.sav"),
                            str(tmp_path / "run_inference_epoch1.sav"))
    assert model.image_shape == (n, m)            # persisted, not passed
    assert model.ecfg.dx_scale == 0.5
    assert model.ecfg.likelihood == "colored"
    assert model.pose_dims == 3

    y = jax.random.uniform(jax.random.PRNGKey(12), (4, n * m))
    key = jax.random.PRNGKey(13)
    got = np.asarray(model.reconstruct(y, key))
    want = np.asarray(trainer.reconstruct(y, key))
    # fit-noise serving output is the predicted mean, shape (B, HW, 1)
    assert got.shape == (4, n * m, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_api_old_checkpoint_requires_image_shape(tmp_path):
    import pytest

    q_cfg = InferenceConfig(n=16, latent_dim=5, hidden_dim=8, num_layers=2)
    p_cfg = SpatialGeneratorConfig(latent_dim=2, hidden_dim=8, num_layers=2)
    kq, kp = jax.random.split(jax.random.PRNGKey(9))
    save_model(str(tmp_path / "g.sav"), "generator",
               spatial_generator_init(kp, p_cfg), p_cfg)
    save_model(str(tmp_path / "i.sav"), "inference",
               inference_init(kq, q_cfg), q_cfg)
    with pytest.raises(ValueError, match="image_shape"):
        SpatialVae.load(str(tmp_path / "g.sav"), str(tmp_path / "i.sav"))
