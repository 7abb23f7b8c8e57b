"""CLI plumbing unit tests: flag aliases, activation dispatch, save labels."""

import argparse

from spatialvae_tpu.cli.common import add_arg, resolve_activation_name
from spatialvae_tpu.train.artifacts import save_label


def test_dual_spelling_aliases():
    p = argparse.ArgumentParser()
    add_arg(p, "--z-dim", type=int, default=2)
    add_arg(p, "--save_prefix")
    a = p.parse_args(["--z_dim", "5", "--save-prefix", "x"])
    assert a.z_dim == 5 and a.save_prefix == "x"
    b = p.parse_args(["--z-dim", "7", "--save_prefix", "y"])
    assert b.z_dim == 7 and b.save_prefix == "y"


def test_activation_dispatch_parity():
    # mnist/particles: relu maps to torch LeakyReLU
    # (train_mnist.py:344-348)
    assert resolve_activation_name("relu", "mnist") == "leakyrelu"
    assert resolve_activation_name("tanh", "particles") == "tanh"
    # galaxy: relu is a real ReLU; 'leakyrelu' falls through to tanh due to
    # the reference's 'leakrelu' dispatch typo (train_galaxy.py:426-434)
    assert resolve_activation_name("relu", "galaxy") == "relu"
    assert resolve_activation_name("leakyrelu", "galaxy") == "tanh"
    assert resolve_activation_name("sigmoid", "galaxy") == "sigmoid"


def test_save_label_scheme():
    # label tags follow dict insertion order (misc_tools.py:16-28)
    args = {"z_dim": 2, "p_num_layers": 3, "q_num_layers": 4,
            "num_epochs": 100}
    assert save_label(args, "pre") == "pre_z2pnl3qnl4ep100"
    args2 = {"z_dim": 5, "num_layers": 2, "num_epochs": 7}
    assert save_label(args2, "t") == "t_z5nl2ep7"


def test_resume_optimizer_requires_both_nets():
    """Adam moments belong to specific parameters: --resume-optimizer
    without both --resume-generator and --resume-inference is a silently
    corrupt 'resume' and must be rejected."""
    import argparse

    import pytest

    from spatialvae_tpu.cli.common import maybe_resume

    args = argparse.Namespace(resume_generator=None, resume_inference=None,
                              resume_optimizer="whatever.sav")
    with pytest.raises(SystemExit, match="resume-optimizer requires"):
        maybe_resume(object(), args)


def test_dx_prior_alias_all_trainers():
    """BASELINE.json config #2 names --dx-prior/--theta-prior (the upstream
    paper spellings); every trainer must accept them (SURVEY 5.6)."""
    from spatialvae_tpu.cli.train_galaxy import galaxy_arguments
    from spatialvae_tpu.cli.train_mnist import mnist_arguments
    from spatialvae_tpu.cli.train_particles import particles_arguments

    a = mnist_arguments(["--dx-prior", "0.3", "--theta-prior", "1.0"])
    assert a.dx_scale == 0.3 and a.theta_prior == 1.0
    b = particles_arguments(["tr.npy", "te.npy", "--dx_prior", "0.2"])
    assert b.dx_scale == 0.2
    c = galaxy_arguments(["tr.npy", "te.npy", "--dx-prior", "0.4"])
    assert c.dx_scale == 0.4


def test_multihost_single_process_smoke():
    """--coordinator/--num-processes wiring: a single-process 'cluster'
    must come up via maybe_multihost and leave JAX functional (SURVEY 5.8).
    Runs in a subprocess so jax.distributed state never leaks into the
    test process."""
    import os
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
import argparse
from spatialvae_tpu.cli.common import maybe_multihost
args = argparse.Namespace(coordinator="localhost:29517",
                          num_processes=1, process_id=0)
assert maybe_multihost(args)
assert jax.process_count() == 1
import jax.numpy as jnp
assert float(jnp.ones(3).sum()) == 3.0
print("MULTIHOST-OK")
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "MULTIHOST-OK" in out.stdout


def test_multihost_flags_through_real_cli(tmp_path):
    """The FULL CLI path with --coordinator must survive JAX's 'initialize
    before any backend init' rule: maybe_mesh (which joins the cluster)
    runs before device_context's jax.devices().  A direct maybe_multihost
    call can't catch an ordering regression — only a real CLI run can.
    Subprocess: jax.distributed state must not leak into this process."""
    import os
    import subprocess
    import sys

    import numpy as np

    rng = np.random.RandomState(5)
    np.save(tmp_path / "gt.npy",
            (rng.rand(32, 8, 8, 3) * 255).astype(np.uint8))
    np.save(tmp_path / "gv.npy",
            (rng.rand(16, 8, 8, 3) * 255).astype(np.uint8))
    code = """
import jax
jax.config.update("jax_platforms", "cpu")
from spatialvae_tpu.cli.train_galaxy import main
main(["gt.npy", "gv.npy", "--num_epochs", "1", "--minibatch_size", "16",
      "--p_hidden_dim", "8", "--q_hidden_dim", "8", "-z", "2",
      "--coordinator", "localhost:29519", "--num-processes", "1",
      "--process-id", "0"])
print("CLI-MULTIHOST-OK")
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["SPATIALVAE_ASSUME_YES"] = "1"
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         cwd=tmp_path, capture_output=True, text=True,
                         timeout=300)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "CLI-MULTIHOST-OK" in out.stdout
    assert "# multi-host: process 0 of 1" in out.stdout


def test_chunk_len_profile_epoch():
    """--profile-dir forces single-epoch dispatches up to the traced
    epoch so the trace captures one warm epoch, then chunking resumes."""
    from spatialvae_tpu.cli.common import chunk_len

    # eval_interval 4, profiling epoch 1: epochs 0 and 1 go alone
    assert chunk_len(0, 10, 4, profile_epoch=1) == 1
    assert chunk_len(1, 10, 4, profile_epoch=1) == 1
    assert chunk_len(2, 10, 4, profile_epoch=1) == 4
    # without profiling the chunk starts full-size immediately
    assert chunk_len(0, 10, 4) == 4
    # resume past the profile epoch: no capping
    assert chunk_len(5, 10, 4, profile_epoch=1) == 4


def test_cpu_run_never_queries_accelerator_devices(monkeypatch):
    """-d -1 (reference: CPU run) must not initialize the accelerator
    backend just to discover a mesh — during a TPU-tunnel outage the
    jax.devices() call in maybe_mesh hung every CPU CLI run.  maybe_mesh
    must return None for device=-1 without any device query."""
    import argparse

    import jax

    from spatialvae_tpu.cli.common import maybe_mesh

    def boom():  # pragma: no cover - called only on regression
        raise AssertionError("jax.devices() reached on a -d -1 run")

    monkeypatch.setattr(jax, "devices", boom)
    args = argparse.Namespace(device=-1, mesh_model=1)
    assert maybe_mesh(args) is None
    # default device (-2) still discovers the mesh (and here, trips)
    args = argparse.Namespace(device=-2, mesh_model=1)
    try:
        maybe_mesh(args)
        raise SystemExit("expected the device query")
    except AssertionError:
        pass


def test_chunked_epochs_trace_and_epoch_advance(monkeypatch):
    """The shared chunk generator: (a) the --profile-dir trace wraps
    exactly the single-epoch chunk holding epoch 1 AND the caller's
    post-chunk work (stop on resume); (b) the yielded epoch cursor
    advances past each chunk; (c) chunks merge once the traced epoch has
    passed, capped by the eval interval."""
    import jax

    from spatialvae_tpu.cli.common import chunked_epochs

    events = []
    monkeypatch.setattr(jax.profiler, "start_trace",
                        lambda d: events.append("start"))
    monkeypatch.setattr(jax.profiler, "stop_trace",
                        lambda: events.append("stop"))

    class FakeTrainer:
        def train_epoch(self, dataset, epoch, **kw):
            return (1.0, 2.0, 3.0)

        def train_epochs(self, dataset, epoch, chunk):
            return [(1.0, 2.0, 3.0)] * chunk

    for rows, epoch in chunked_epochs(FakeTrainer(), None, 0, 4,
                                      eval_interval=2, save_interval=None,
                                      profile_dir="/tmp/x"):
        events.append(("chunk", [r[0] for r in rows], epoch))
        for _, tr in rows:
            assert tr == (1.0, 2.0, 3.0)

    # epochs 0 and 1 run alone (trace pending), only epoch 1 is traced,
    # the caller's work lands before the stop, then 2-3 run as one chunk
    assert events == [
        ("chunk", [0], 1),
        "start", ("chunk", [1], 2), "stop",
        ("chunk", [2, 3], 4),
    ]

    # no profile dir: full-size chunks from the start, no trace events
    events.clear()
    for rows, epoch in chunked_epochs(FakeTrainer(), None, 0, 4,
                                      eval_interval=2):
        events.append(("chunk", [r[0] for r in rows], epoch))
    assert events == [("chunk", [0, 1], 2), ("chunk", [2, 3], 4)]


def test_device_context_restores_moments_env(monkeypatch):
    """A bf16 --adam-moments run must not leak SPATIALVAE_ADAM_MOMENTS
    into a later in-process run that asked for the f32 default."""
    import os

    from spatialvae_tpu.cli.common import device_context

    monkeypatch.delenv("SPATIALVAE_ADAM_MOMENTS", raising=False)
    with device_context(-1, adam_moments="bf16"):
        assert os.environ["SPATIALVAE_ADAM_MOMENTS"] == "bf16"
    assert "SPATIALVAE_ADAM_MOMENTS" not in os.environ
    # an f32 run after a leaked setting overrides it for its duration
    monkeypatch.setenv("SPATIALVAE_ADAM_MOMENTS", "bf16")
    with device_context(-1, adam_moments="f32"):
        assert os.environ["SPATIALVAE_ADAM_MOMENTS"] == "f32"
    assert os.environ["SPATIALVAE_ADAM_MOMENTS"] == "bf16"


def test_resume_honors_adam_moments(tmp_path, monkeypatch):
    """--adam-moments must apply on --resume-optimizer too: fused_adam
    adapts to the loaded m.dtype, so without the cast the flag would be a
    silent no-op on resumed runs."""
    import jax.numpy as jnp
    import numpy as np

    from spatialvae_tpu.cli.common import maybe_resume
    from spatialvae_tpu.core.config import (
        InferenceConfig,
        SpatialGeneratorConfig,
    )
    from spatialvae_tpu.objectives import ElboConfig
    from spatialvae_tpu.train import Trainer, TrainConfig
    from spatialvae_tpu.train.checkpoint import save_model, save_optimizer
    from spatialvae_tpu.transforms.coords import coord_grid

    n = 8
    q_cfg = InferenceConfig(n=n * n, latent_dim=5, hidden_dim=16,
                            num_layers=2)
    p_cfg = SpatialGeneratorConfig(latent_dim=2, hidden_dim=16,
                                   num_layers=2)
    ecfg = ElboConfig(likelihood="bernoulli", theta_prior=np.pi)
    tcfg = TrainConfig(minibatch_size=16, num_epochs=2, seed=0,
                       image_shape=(n, n))
    monkeypatch.delenv("SPATIALVAE_ADAM_MOMENTS", raising=False)
    t = Trainer(q_cfg, p_cfg, ecfg, tcfg, coord_grid(n, n))
    gen = str(tmp_path / "t_generator_epoch1.sav")
    inf = str(tmp_path / "t_inference_epoch1.sav")
    opt = str(tmp_path / "t_optimizer_epoch1.sav")
    save_model(gen, "generator", t.state.params["p"], p_cfg)
    save_model(inf, "inference", t.state.params["q"], q_cfg)
    save_optimizer(opt, t.state.opt_state, epoch=0)

    monkeypatch.setenv("SPATIALVAE_ADAM_MOMENTS", "bf16")
    args = argparse.Namespace(resume_generator=gen, resume_inference=inf,
                              resume_optimizer=opt)
    maybe_resume(t, args)
    import jax

    for leaf in jax.tree.leaves(t.state.opt_state.mu):
        assert leaf.dtype == jnp.bfloat16
    for leaf in jax.tree.leaves(t.state.opt_state.nu):
        assert leaf.dtype == jnp.bfloat16


def test_int8_sr_flag_scopes_env():
    """--int8-sr is the sanctioned path to the SR numerics knob: inside
    device_context it sets SPATIALVAE_SR (+ the guard opt-in) and the
    trainer guard accepts; on exit both restore so a later run in the
    same process fails the guard again if the env leaks from elsewhere."""
    import os

    from spatialvae_tpu.cli.common import device_context
    from spatialvae_tpu.kernels.config import (
        KernelConfig,
        check_numerics_default,
    )

    for v in ("SPATIALVAE_SR", "SPATIALVAE_ALLOW_KNOBS"):
        os.environ.pop(v, None)
    with device_context(-1, int8_sr=True):
        assert os.environ["SPATIALVAE_SR"] == "1"
        assert KernelConfig.from_env().sr is True
        check_numerics_default()          # sanctioned, no raise
    assert "SPATIALVAE_SR" not in os.environ
    assert "SPATIALVAE_ALLOW_KNOBS" not in os.environ
    assert KernelConfig.from_env().sr is False
