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
