"""CLI contract tests (SURVEY.md section 4.4): run each trainer a couple of
epochs on synthetic data and assert the output tree + TSV formats match the
reference's (misc_tools.py:49-85, train_mnist.py:406-446)."""

import os
import zipfile

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _noninteractive(monkeypatch):
    monkeypatch.setenv("SPATIALVAE_ASSUME_YES", "1")


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _mk_mnist(tmp_path):
    rng = np.random.RandomState(0)
    d = tmp_path / "data" / "mnist_rotated"
    d.mkdir(parents=True)
    np.save(d / "images_train.npy",
            (rng.rand(96, 10, 10) * 255).astype(np.uint8))
    np.save(d / "images_test.npy",
            (rng.rand(40, 10, 10) * 255).astype(np.uint8))


def test_mnist_cli_contract(workdir, capsys):
    from spatialvae_tpu.cli.train_mnist import main

    _mk_mnist(workdir)
    main(["--dataset", "mnist-rotated", "--num_epochs", "2",
          "--minibatch_size", "36", "--save_interval", "2",
          "--save_prefix", "t", "--p_hidden_dim", "16",
          "--q_hidden_dim", "16"])

    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if "\t" in ln]
    assert lines[0] == "Epoch\tELBO\tBCE loss\tKL"
    # 2 epochs x (train + val) rows; epoch column 0-based
    assert len(lines) == 5
    assert lines[1].split("\t")[0] == "0"
    assert len(lines[1].split("\t")) == 4

    root = workdir / "outputs_t"
    assert (root / "command.txt").exists()
    assert (root / "models.txt").exists()
    assert (root / "train.txt").exists()
    assert (root / "val.txt").exists()
    label = "t_z2nl2ep2"
    assert (root / "images" / f"_sample_{label}.png").exists()
    assert (root / "images" / f"2_{label}.png").exists()
    assert (root / "images" / f"2_dis_{label}.png").exists()
    assert (root / "images" / "ELBO.svg").exists()
    assert (root / "images" / "KL_Divergence.svg").exists()
    assert (root / "images" / "BCE_Loss.svg").exists()
    assert (root / "trained" / "t_generator_epoch2.sav").exists()
    assert (root / "trained" / "t_inference_epoch2.sav").exists()
    zips = [f for f in os.listdir(workdir) if f.endswith("_outputs_t.zip")]
    assert len(zips) == 1
    with zipfile.ZipFile(workdir / zips[0]) as zf:
        assert any(n.endswith("train.txt") for n in zf.namelist())

    # command.txt: first line is the reconstructed invocation
    first = (root / "command.txt").read_text().splitlines()[0]
    assert first.startswith("python ")
    # models.txt: torch-style reprs
    models = (root / "models.txt").read_text()
    assert "SpatialGenerator(" in models and "InferenceNetwork(" in models

    # train.txt parity with stdout rows
    assert (root / "train.txt").read_text().splitlines()[1] == lines[1]


def test_mnist_cli_eval_interval_matches_trajectory(workdir, capsys):
    """--eval-interval N (additive): N>1 rides the one-dispatch multi-epoch
    scan between evals; the train-metric trajectory must match the N=1
    (reference-behavior) run, with evals only at chunk boundaries."""
    from spatialvae_tpu.cli.train_mnist import main

    _mk_mnist(workdir)
    for i, extra in enumerate([[], ["--eval-interval", "2"]]):
        main(["--dataset", "mnist-rotated", "--num_epochs", "4",
              "--minibatch_size", "32", "--save_interval", "4",
              "--save_prefix", f"ei{i}", "--p_hidden_dim", "16",
              "--q_hidden_dim", "16", *extra])
        capsys.readouterr()

    def rows(path):
        lines = (workdir / path).read_text().splitlines()[1:]
        return np.asarray([[float(v) for v in ln.split("\t")]
                           for ln in lines])

    tr0 = rows("outputs_ei0/train.txt")
    tr1 = rows("outputs_ei1/train.txt")
    assert tr0.shape == tr1.shape == (4, 4)
    np.testing.assert_allclose(tr1, tr0, rtol=1e-6, atol=1e-7)
    # evals happen only at the chunk boundaries (epochs 2 and 4)
    va0 = rows("outputs_ei0/val.txt")
    va1 = rows("outputs_ei1/val.txt")
    assert va0.shape == (4, 4) and va1.shape == (2, 4)
    assert list(va1[:, 0]) == [1.0, 3.0]
    # the boundary evals agree with the per-epoch run's same-epoch evals
    np.testing.assert_allclose(va1, va0[[1, 3]], rtol=1e-6, atol=1e-7)


def test_mnist_cli_vanilla(workdir, capsys):
    from spatialvae_tpu.cli.train_mnist import main

    _mk_mnist(workdir)
    main(["--dataset", "mnist-rotated", "--num_epochs", "1",
          "--minibatch_size", "32", "--save_prefix", "v", "--vanilla",
          "--p_hidden_dim", "16", "--q_hidden_dim", "16"])
    models = (workdir / "outputs_v" / "models.txt").read_text()
    assert "VanillaGenerator(" in models


def test_particles_cli_contract(workdir, capsys):
    from spatialvae_tpu.cli.train_particles import main

    rng = np.random.RandomState(1)
    np.save(workdir / "tr.npy", rng.randn(64, 9, 9).astype(np.float32))
    np.save(workdir / "te.npy", rng.randn(32, 9, 9).astype(np.float32))
    rows = [f"1.5 2.0 300.0 1.2 50.0 10.0 0.0 {i}" for i in range(64)]
    (workdir / "ctf.txt").write_text("\n".join(rows))
    (workdir / "ctf_te.txt").write_text("\n".join(rows[:32]))

    main(["tr.npy", "te.npy", "--num-epochs", "2", "--minibatch-size", "32",
          "--p-hidden-dim", "12", "--q-hidden-dim", "12",
          "--ctf-train", "ctf.txt", "--ctf-test", "ctf_te.txt",
          "--fit-noise", "--mask", "--normalize",
          "--save-prefix", str(workdir / "pp"), "--save-interval", "1"])

    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if "\t" in ln]
    assert lines[0] == "Epoch\tSplit\tELBO\tError\tKL"
    assert lines[1].split("\t")[:2] == ["1", "train"]
    assert lines[2].split("\t")[:2] == ["1", "test"]
    # per-interval checkpoints at the bare prefix
    for e in (1, 2):
        assert (workdir / f"pp_generator_epoch{e}.sav").exists()
        assert (workdir / f"pp_inference_epoch{e}.sav").exists()


def test_particles_cli_underscore_spellings(workdir, capsys):
    """particles must also accept underscore spellings (cross-CLI aliases)."""
    from spatialvae_tpu.cli.train_particles import main

    rng = np.random.RandomState(2)
    np.save(workdir / "tr.npy", rng.randn(32, 8, 8).astype(np.float32))
    np.save(workdir / "te.npy", rng.randn(16, 8, 8).astype(np.float32))
    main(["tr.npy", "te.npy", "--num_epochs", "1", "--minibatch_size", "16",
          "--p_hidden_dim", "8", "--q_hidden_dim", "8"])
    out = capsys.readouterr().out
    assert "Epoch\tSplit" in out


def test_galaxy_cli_contract(workdir, capsys):
    from spatialvae_tpu.cli.train_galaxy import main

    rng = np.random.RandomState(3)
    np.save(workdir / "gt.npy", (rng.rand(48, 8, 8, 3) * 255).astype(np.uint8))
    np.save(workdir / "gv.npy", (rng.rand(16, 8, 8, 3) * 255).astype(np.uint8))

    main(["gt.npy", "gv.npy", "--num_epochs", "2", "--minibatch_size", "16",
          "--p_hidden_dim", "12", "--q_hidden_dim", "16", "-z", "3",
          "--save_prefix", "g", "--save_interval", "2",
          "--num_train_images", "32", "--z_delay", "1"])

    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if "\t" in ln]
    assert lines[0] == "Epoch\tELBO\tBCE loss\tKL"
    root = workdir / "outputs_g"
    assert (root / "run.log").exists()
    label = "g_z3pnl2qnl2ep2"
    assert (root / "images" / f"2_rnd_{label}.png").exists()
    assert (root / "images" / f"2_dis_{label}.png").exists()
    log = (root / "run.log").read_text()
    assert "Started" in log and "Finished" in log


def test_galaxy_cli_make_mono(workdir, capsys):
    from spatialvae_tpu.cli.train_galaxy import main

    rng = np.random.RandomState(4)
    np.save(workdir / "gt.npy", (rng.rand(32, 8, 8, 3) * 255).astype(np.uint8))
    np.save(workdir / "gv.npy", (rng.rand(16, 8, 8, 3) * 255).astype(np.uint8))
    main(["gt.npy", "gv.npy", "--num_epochs", "1", "--minibatch_size", "16",
          "--p_hidden_dim", "8", "--q_hidden_dim", "8", "--make_mono",
          "--invert_colours", "--save_prefix", "m"])
    models = (workdir / "outputs_m" / "models.txt").read_text()
    # mono: q input is 8*8*1
    assert "in_features=64" in models


def test_checkpoint_roundtrip(workdir):
    from spatialvae_tpu.core.config import SpatialGeneratorConfig
    from spatialvae_tpu.models import spatial_generator_init
    from spatialvae_tpu.train.checkpoint import load_model, save_model

    import jax

    cfg = SpatialGeneratorConfig(latent_dim=2, hidden_dim=8, num_layers=2)
    params = spatial_generator_init(jax.random.PRNGKey(0), cfg)
    save_model(str(workdir / "x.sav"), "generator", params, cfg)
    p2, cfg2, kind = load_model(str(workdir / "x.sav"))
    assert kind == "generator"
    assert cfg2 == cfg
    np.testing.assert_array_equal(np.asarray(params["coord"]["w"]),
                                  p2["coord"]["w"])


def test_mnist_cli_galaxy_dataset(workdir, capsys):
    """--dataset galaxy: channel-mean of RGB npy stacks
    (train_mnist.py:295-300)."""
    from spatialvae_tpu.cli.train_mnist import main

    rng = np.random.RandomState(9)
    d = workdir / "data" / "galaxy_zoo"
    d.mkdir(parents=True)
    np.save(d / "galaxy_zoo_train.npy",
            (rng.rand(32, 8, 8, 3) * 255).astype(np.uint8))
    np.save(d / "galaxy_zoo_test.npy",
            (rng.rand(16, 8, 8, 3) * 255).astype(np.uint8))
    main(["--dataset", "galaxy", "--num_epochs", "1", "--minibatch_size",
          "16", "--save_prefix", "gx", "--p_hidden_dim", "8",
          "--q_hidden_dim", "8"])
    models = (workdir / "outputs_gx" / "models.txt").read_text()
    assert "in_features=64" in models        # mono: 8*8 pixels


def test_profile_dir_writes_trace(workdir, capsys):
    from spatialvae_tpu.cli.train_mnist import main

    _mk_mnist(workdir)
    main(["--dataset", "mnist-rotated", "--num_epochs", "2",
          "--minibatch_size", "48", "--save_prefix", "pr",
          "--p_hidden_dim", "8", "--q_hidden_dim", "8",
          "--profile-dir", str(workdir / "trace")])
    assert (workdir / "trace").exists()


def test_mnist_idx_fallback(workdir):
    """'mnist' dataset without torchvision: raw idx3-ubyte files are read
    directly (gz and plain)."""
    import gzip
    import struct

    from spatialvae_tpu.cli.train_mnist import load_mnist_arrays

    d = workdir / "data" / "mnist"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)

    def write_idx(path, n, gz=False):
        imgs = rng.randint(0, 255, size=(n, 6, 6), dtype=np.uint8)
        payload = struct.pack(">IIII", 2051, n, 6, 6) + imgs.tobytes()
        opener = gzip.open if gz else open
        with opener(path, "wb") as f:
            f.write(payload)
        return imgs

    tr = write_idx(d / "train-images-idx3-ubyte", 10)
    te = write_idx(d / "t10k-images-idx3-ubyte.gz", 4, gz=True)
    train, test = load_mnist_arrays("mnist")
    np.testing.assert_array_equal(train, tr)
    np.testing.assert_array_equal(test, te)


def test_mnist_cli_no_rotate_no_translate(workdir, capsys):
    """--no_rotate/--no_translate shrink inf_dim and skip pose slots
    (train_mnist.py:361-369)."""
    from spatialvae_tpu.cli.train_mnist import main

    _mk_mnist(workdir)
    main(["--dataset", "mnist-rotated", "--num_epochs", "1",
          "--minibatch_size", "32", "--save_prefix", "nr",
          "--no_rotate", "--no_translate",
          "--p_hidden_dim", "8", "--q_hidden_dim", "8", "-z", "4"])
    models = (workdir / "outputs_nr" / "models.txt").read_text()
    # inf_dim == z_dim: q output is 2*4
    assert "out_features=8, bias=True)\n  )\n)" in models


def test_particles_cli_expand_bilinear_resid(workdir, capsys):
    """--expand-coords/--bilinear/--resid exercise the generic (non-folded)
    decoder end-to-end (models.py:65-75)."""
    from spatialvae_tpu.cli.train_particles import main

    rng = np.random.RandomState(5)
    np.save(workdir / "tr.npy", rng.randn(32, 8, 8).astype(np.float32))
    np.save(workdir / "te.npy", rng.randn(16, 8, 8).astype(np.float32))
    main(["tr.npy", "te.npy", "--num-epochs", "1", "--minibatch-size", "16",
          "--p-hidden-dim", "12", "--q-hidden-dim", "12",
          "--expand-coords", "--bilinear", "--resid", "--softplus"])
    out = capsys.readouterr().out
    rows = [ln for ln in out.splitlines() if "\t" in ln]
    assert rows[1].split("\t")[1] == "train"
    vals = [float(v) for v in rows[1].split("\t")[2:]]
    assert all(np.isfinite(vals))


def test_galaxy_cli_vanilla(workdir, capsys):
    from spatialvae_tpu.cli.train_galaxy import main

    rng = np.random.RandomState(6)
    np.save(workdir / "gt.npy", (rng.rand(32, 8, 8, 3) * 255).astype(np.uint8))
    np.save(workdir / "gv.npy", (rng.rand(16, 8, 8, 3) * 255).astype(np.uint8))
    main(["gt.npy", "gv.npy", "--num_epochs", "1", "--minibatch_size", "16",
          "--p_hidden_dim", "8", "--q_hidden_dim", "8", "--vanilla",
          "--save_prefix", "vg"])
    models = (workdir / "outputs_vg" / "models.txt").read_text()
    # vanilla n_out = channels*rows*cols = 192
    assert "out_features=192" in models
