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
