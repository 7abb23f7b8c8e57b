"""Reference .sav (torch whole-module pickle) import.

Saves ACTUAL reference modules (spatial_vae/models.py via
tests/reference_stub.py) with torch.save — byte-for-byte what
misc_tools.py:88-104 writes — then imports them through
spatialvae_tpu.io.torch_import and asserts (a) the recovered config
matches the constructor arguments and (b) our apply reproduces the torch
forward on random inputs.
"""

import os
import sys

import numpy as np
import pytest

from tests.test_reference_parity import REF, pytestmark  # noqa: F401

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_models():
    from tests.reference_stub import import_reference_modules

    return import_reference_modules()[0]


def _save(tmp_path, module, name):
    path = str(tmp_path / name)
    torch.save(module.eval(), path)
    return path


def _rand_inputs(rng, b, hw, latent):
    x = rng.uniform(-1, 1, size=(b, hw, 2)).astype(np.float32)
    z = rng.standard_normal((b, latent)).astype(np.float32) if latent \
        else None
    return x, z


@pytest.mark.parametrize("kwargs", [
    dict(latent_dim=5, hidden_dim=16, n_out=1, num_layers=1),
    dict(latent_dim=5, hidden_dim=16, n_out=2, num_layers=2,
         softplus=True),
    dict(latent_dim=4, hidden_dim=12, n_out=1, num_layers=3, resid=True,
         activation=torch.nn.LeakyReLU),
    dict(latent_dim=3, hidden_dim=10, n_out=1, num_layers=2,
         expand_coords=True),
    dict(latent_dim=3, hidden_dim=10, n_out=1, num_layers=1,
         bilinear=True),
    dict(latent_dim=0, hidden_dim=8, n_out=1, num_layers=1),
])
def test_spatial_generator_roundtrip(tmp_path, ref_models, kwargs):
    from spatialvae_tpu.io.torch_import import import_generator
    from spatialvae_tpu.models import spatial_generator_apply

    torch.manual_seed(0)
    p_net = ref_models.SpatialGenerator(**kwargs)
    path = _save(tmp_path, p_net, "g.sav")

    params, cfg = import_generator(path)
    assert cfg.latent_dim == kwargs["latent_dim"]
    assert cfg.hidden_dim == kwargs["hidden_dim"]
    assert cfg.n_out == kwargs.get("n_out", 1)
    assert cfg.num_layers == kwargs.get("num_layers", 1)
    assert cfg.softplus == kwargs.get("softplus", False)
    assert cfg.resid == kwargs.get("resid", False)
    assert cfg.expand_coords == kwargs.get("expand_coords", False)
    assert cfg.bilinear == kwargs.get("bilinear", False)
    assert cfg.activation == (
        "leakyrelu" if kwargs.get("activation") is torch.nn.LeakyReLU
        else "tanh")

    rng = np.random.default_rng(1)
    x, z = _rand_inputs(rng, b=3, hw=7, latent=cfg.latent_dim)
    with torch.no_grad():
        want = p_net(torch.tensor(x),
                     torch.tensor(z) if z is not None
                     else torch.zeros(3, 0)).numpy()
    got = np.asarray(spatial_generator_apply(params, cfg, x, z))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kwargs", [
    dict(n=24, latent_dim=4, hidden_dim=12, n_out=1, num_layers=1),
    dict(n=24, latent_dim=4, hidden_dim=12, n_out=2, num_layers=2,
         softplus=True),
    dict(n=16, latent_dim=3, hidden_dim=8, n_out=1, num_layers=3,
         resid=True, activation=torch.nn.LeakyReLU),
])
def test_vanilla_generator_roundtrip(tmp_path, ref_models, kwargs):
    from spatialvae_tpu.io.torch_import import import_generator
    from spatialvae_tpu.models import vanilla_generator_apply

    torch.manual_seed(0)
    p_net = ref_models.VanillaGenerator(**kwargs)
    path = _save(tmp_path, p_net, "g.sav")

    params, cfg = import_generator(path)
    assert (cfg.n, cfg.latent_dim, cfg.hidden_dim) == (
        kwargs["n"], kwargs["latent_dim"], kwargs["hidden_dim"])
    assert cfg.n_out == kwargs.get("n_out", 1)
    assert cfg.num_layers == kwargs.get("num_layers", 1)
    assert cfg.softplus == kwargs.get("softplus", False)
    assert cfg.resid == kwargs.get("resid", False)

    rng = np.random.default_rng(1)
    z = rng.standard_normal((3, cfg.latent_dim)).astype(np.float32)
    with torch.no_grad():
        want = p_net(None, torch.tensor(z)).numpy()
    got = np.asarray(vanilla_generator_apply(params, cfg, None, z))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kwargs", [
    dict(n=32, latent_dim=6, hidden_dim=20, num_layers=1),
    dict(n=32, latent_dim=6, hidden_dim=20, num_layers=3, resid=True,
         activation=torch.nn.LeakyReLU),
])
def test_inference_roundtrip(tmp_path, ref_models, kwargs):
    from spatialvae_tpu.io.torch_import import import_inference
    from spatialvae_tpu.models import inference_apply

    torch.manual_seed(0)
    q_net = ref_models.InferenceNetwork(**kwargs)
    path = _save(tmp_path, q_net, "q.sav")

    params, cfg = import_inference(path)
    assert (cfg.n, cfg.latent_dim, cfg.hidden_dim, cfg.num_layers) == (
        kwargs["n"], kwargs["latent_dim"], kwargs["hidden_dim"],
        kwargs["num_layers"])
    assert cfg.resid == kwargs.get("resid", False)

    rng = np.random.default_rng(1)
    y = rng.uniform(0, 1, size=(4, cfg.n)).astype(np.float32)
    with torch.no_grad():
        mu_t, ls_t = q_net(torch.tensor(y))
    mu, ls = inference_apply(params, cfg, y)
    np.testing.assert_allclose(np.asarray(mu), mu_t.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ls), ls_t.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_import_without_reference_package(tmp_path, ref_models):
    """Unpickling falls back to stand-in classes when spatial_vae is not
    importable — a migrating user does not need the reference installed."""
    from spatialvae_tpu.io.torch_import import import_generator

    torch.manual_seed(0)
    p_net = ref_models.SpatialGenerator(latent_dim=3, hidden_dim=8,
                                        num_layers=2, resid=True)
    path = _save(tmp_path, p_net, "g.sav")
    with_pkg, cfg = import_generator(path)

    saved = {k: sys.modules.get(k)
             for k in ("spatial_vae", "spatial_vae.models")}
    try:
        for k in saved:
            sys.modules.pop(k, None)
        without_pkg, cfg2 = import_generator(path)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    assert cfg2 == cfg
    for a, b in zip(jax_leaves(with_pkg), jax_leaves(without_pkg)):
        np.testing.assert_array_equal(a, b)


def test_standins_never_linger(tmp_path, ref_models):
    """Importing a .sav without the reference package must not leave the
    stand-in spatial_vae modules cached in sys.modules (they would shadow
    a real reference package imported later in the process)."""
    from spatialvae_tpu.io.torch_import import import_generator

    torch.manual_seed(1)
    p_net = ref_models.SpatialGenerator(latent_dim=2, hidden_dim=6,
                                        num_layers=1)
    path = _save(tmp_path, p_net, "g2.sav")
    saved = {k: sys.modules.get(k)
             for k in ("spatial_vae", "spatial_vae.models")}
    try:
        for k in saved:
            sys.modules.pop(k, None)
        import_generator(path)
        assert "spatial_vae" not in sys.modules
        assert "spatial_vae.models" not in sys.modules
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def test_checkpoint_loader_detects_sav(tmp_path, ref_models):
    """load_model/load_model_meta route .sav files through the torch
    importer transparently, so --resume-generator accepts them."""
    from spatialvae_tpu.train.checkpoint import load_model

    torch.manual_seed(0)
    p_net = ref_models.SpatialGenerator(latent_dim=3, hidden_dim=8)
    q_net = ref_models.InferenceNetwork(n=18, latent_dim=6, hidden_dim=10)
    g = _save(tmp_path, p_net, "run_generator_epoch010.sav")
    q = _save(tmp_path, q_net, "run_inference_epoch010.sav")

    p_params, p_cfg, kind = load_model(g)
    assert kind == "generator" and p_cfg.hidden_dim == 8
    q_params, q_cfg, kind = load_model(q)
    assert kind == "inference" and q_cfg.latent_dim == 6

    # a non-checkpoint file still errors clearly
    bad = tmp_path / "junk.sav"
    bad.write_bytes(b"\x00\x01\x02 not a checkpoint")
    with pytest.raises(ValueError, match="neither"):
        load_model(str(bad))


def test_api_loads_reference_checkpoints(tmp_path, ref_models):
    """SpatialVae.load on a reference pair: encode/decode/reconstruct run
    (image_shape must be passed — the reference never persisted it)."""
    import jax

    from spatialvae_tpu.api import SpatialVae

    n = m = 6
    torch.manual_seed(0)
    z_dim = 3
    p_net = ref_models.SpatialGenerator(latent_dim=z_dim, hidden_dim=8)
    q_net = ref_models.InferenceNetwork(n=n * m, latent_dim=z_dim + 3,
                                        hidden_dim=10)
    g = _save(tmp_path, p_net, "run_generator_epoch010.sav")
    q = _save(tmp_path, q_net, "run_inference_epoch010.sav")

    with pytest.raises(ValueError):
        SpatialVae.load(g, q)
    model = SpatialVae.load(g, q, image_shape=(n, m))
    y = np.random.default_rng(0).uniform(
        0, 1, size=(2, n * m)).astype(np.float32)
    mu, ls = model.encode(y)
    assert mu.shape == (2, z_dim + 3)
    rec = model.reconstruct(y, jax.random.PRNGKey(0))
    assert rec.shape[0] == 2 and np.isfinite(np.asarray(rec)).all()


# ---------------------------------------------------------------------------
# export: our params -> reference-format torch modules
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kind,kwargs", [
    ("spatial", dict(latent_dim=4, hidden_dim=10, n_out=2, num_layers=2,
                     softplus=True)),
    ("spatial", dict(latent_dim=3, hidden_dim=8, n_out=1, num_layers=3,
                     resid=True, activation="leakyrelu")),
    ("spatial", dict(latent_dim=3, hidden_dim=8, n_out=1, num_layers=1,
                     bilinear=True)),
    ("spatial", dict(latent_dim=0, hidden_dim=8, n_out=1, num_layers=1,
                     expand_coords=True)),
    ("vanilla", dict(n=20, latent_dim=3, hidden_dim=8, n_out=2,
                     num_layers=2, softplus=True, resid=True)),
    ("inference", dict(n=24, latent_dim=5, hidden_dim=12, num_layers=2,
                       resid=True, activation="leakyrelu")),
])
def test_export_roundtrips_and_loads_with_real_classes(
        tmp_path, ref_models, kind, kwargs):
    """export -> import is bit-exact, and the exported pickle loads as the
    REAL reference class and reproduces our forward."""
    import jax

    from spatialvae_tpu.core.config import (
        InferenceConfig,
        SpatialGeneratorConfig,
        VanillaGeneratorConfig,
    )
    from spatialvae_tpu.io import torch_import as ti
    from spatialvae_tpu.models import (
        inference_apply,
        inference_init,
        spatial_generator_apply,
        spatial_generator_init,
        vanilla_generator_apply,
        vanilla_generator_init,
    )

    key = jax.random.PRNGKey(0)
    path = str(tmp_path / "x.sav")
    rng = np.random.default_rng(2)
    if kind == "inference":
        cfg = InferenceConfig(**kwargs)
        params = inference_init(key, cfg)
        ti.export_inference(params, cfg, path)
        params2, cfg2 = ti.import_inference(path)
        net = torch.load(path, map_location="cpu", weights_only=False)
        assert type(net) is ref_models.InferenceNetwork
        y = rng.uniform(0, 1, size=(3, cfg.n)).astype(np.float32)
        with torch.no_grad():
            mu_t, ls_t = net(torch.tensor(y))
        mu, ls = inference_apply(params, cfg, y)
        np.testing.assert_allclose(np.asarray(mu), mu_t.numpy(),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ls), ls_t.numpy(),
                                   rtol=1e-5, atol=1e-5)
    elif kind == "vanilla":
        cfg = VanillaGeneratorConfig(**kwargs)
        params = vanilla_generator_init(key, cfg)
        ti.export_generator(params, cfg, path)
        params2, cfg2 = ti.import_generator(path)
        net = torch.load(path, map_location="cpu", weights_only=False)
        assert type(net) is ref_models.VanillaGenerator
        z = rng.standard_normal((3, cfg.latent_dim)).astype(np.float32)
        with torch.no_grad():
            want = net(None, torch.tensor(z)).numpy()
        got = np.asarray(vanilla_generator_apply(params, cfg, None, z))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    else:
        cfg = SpatialGeneratorConfig(**kwargs)
        params = spatial_generator_init(key, cfg)
        ti.export_generator(params, cfg, path)
        params2, cfg2 = ti.import_generator(path)
        net = torch.load(path, map_location="cpu", weights_only=False)
        assert type(net) is ref_models.SpatialGenerator
        x, z = _rand_inputs(rng, b=3, hw=7, latent=cfg.latent_dim)
        with torch.no_grad():
            want = net(torch.tensor(x),
                       torch.tensor(z) if z is not None
                       else torch.zeros(3, 0)).numpy()
        got = np.asarray(spatial_generator_apply(params, cfg, x, z))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    assert cfg2 == cfg
    for a, b in zip(jax_leaves(params), jax_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a, np.float32), b)


def test_export_without_reference_package(tmp_path, ref_models):
    """Exporting with only the stand-in classes registered produces a
    pickle the REAL reference classes load and run."""
    import jax

    from spatialvae_tpu.core.config import SpatialGeneratorConfig
    from spatialvae_tpu.io import torch_import as ti
    from spatialvae_tpu.models import (
        spatial_generator_apply,
        spatial_generator_init,
    )

    cfg = SpatialGeneratorConfig(latent_dim=3, hidden_dim=8, num_layers=2)
    params = spatial_generator_init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "g.sav")

    saved = {k: sys.modules.get(k)
             for k in ("spatial_vae", "spatial_vae.models")}
    try:
        for k in saved:
            sys.modules.pop(k, None)
        ti.export_generator(params, cfg, path)
        # exported against transient stand-ins, which must NOT linger:
        # a cached fake spatial_vae would shadow the real package if the
        # user puts it on sys.path later in the same process
        assert "spatial_vae" not in sys.modules
        assert "spatial_vae.models" not in sys.modules
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    net = torch.load(path, map_location="cpu", weights_only=False)
    assert type(net) is ref_models.SpatialGenerator
    rng = np.random.default_rng(3)
    x, z = _rand_inputs(rng, b=2, hw=5, latent=3)
    with torch.no_grad():
        want = net(torch.tensor(x), torch.tensor(z)).numpy()
    got = np.asarray(spatial_generator_apply(params, cfg, x, z))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_tool(tmp_path, ref_models):
    """tools/export_torch_checkpoint.py converts our checkpoint files."""
    import subprocess

    import jax

    from spatialvae_tpu.core.config import SpatialGeneratorConfig
    from spatialvae_tpu.models import spatial_generator_init
    from spatialvae_tpu.train.checkpoint import save_model

    cfg = SpatialGeneratorConfig(latent_dim=2, hidden_dim=6)
    params = spatial_generator_init(jax.random.PRNGKey(0), cfg)
    src = str(tmp_path / "ours_generator_epoch001.sav")
    dst = str(tmp_path / "torch_generator_epoch001.sav")
    save_model(src, "generator", params, cfg)

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "/root/repo/tools/export_torch_checkpoint.py",
         src, dst], capture_output=True, text=True, env=env)
    assert out.returncode == 0, out.stderr
    net = torch.load(dst, map_location="cpu", weights_only=False)
    assert type(net) is ref_models.SpatialGenerator

