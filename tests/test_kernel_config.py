"""KernelConfig: the one frozen source of fused-kernel knob defaults.

Pins (a) the measured-plateau defaults so a drive-by edit cannot silently
change the production numerics/perf stack, (b) env resolution/validation,
and (c) the trainer-entry guard that rejects off-default numerics knobs
unless the process is a measurement entry point (SPATIALVAE_ALLOW_KNOBS)."""

import numpy as np
import pytest

from spatialvae_tpu.kernels.config import (
    NUMERICS_FIELDS,
    KernelConfig,
    check_numerics_default,
)

_KNOB_VARS = [
    "SPATIALVAE_PIPE_IMGS", "SPATIALVAE_LOSS_TILE",
    "SPATIALVAE_VMEM_OVERRIDE", "SPATIALVAE_MXU_BUILD",
    "SPATIALVAE_INT4_GRADS", "SPATIALVAE_GSCALE", "SPATIALVAE_EPI",
    "SPATIALVAE_TANH", "SPATIALVAE_SR", "SPATIALVAE_A1Q",
    "SPATIALVAE_DB1", "SPATIALVAE_PHASE_CUT", "SPATIALVAE_LOSS_LAYOUT",
    "SPATIALVAE_INT4_GRADS_T", "SPATIALVAE_INTERPRET",
    "SPATIALVAE_ALLOW_KNOBS",
]


@pytest.fixture
def clean_env(monkeypatch):
    for v in _KNOB_VARS:
        monkeypatch.delenv(v, raising=False)
    return monkeypatch


def test_defaults_are_the_measured_plateau(clean_env):
    cfg = KernelConfig.from_env()
    # round-3/4 production stack (CLAUDE.md): bound/i4dw1/depth-8,
    # bf16 epilogue, exact tanh, no SR/a1q, chain db1, row layout
    assert cfg == KernelConfig()
    assert cfg.grad_mode == "i4dw1"
    assert cfg.gscale == "bound"
    assert cfg.pipe_imgs == 8
    assert cfg.pipe_imgs_t == 4
    assert cfg.epi == "bf16"
    assert cfg.tanh == "exact"
    assert cfg.sr is False and cfg.a1q is False
    assert cfg.db1 == "chain" and cfg.phase_cut == 8
    assert cfg.layout == "row" and cfg.grad_mode_t == "i4"
    assert cfg.loss_tile is None and cfg.vmem_override_mb is None
    assert cfg.mxu_build is False and cfg.interpret is False


def test_env_resolution_and_validation(clean_env):
    clean_env.setenv("SPATIALVAE_INT4_GRADS", "i8")
    clean_env.setenv("SPATIALVAE_PIPE_IMGS", "2")
    clean_env.setenv("SPATIALVAE_LOSS_TILE", "0")       # typo'd 0 -> auto
    cfg = KernelConfig.from_env()
    assert cfg.grad_mode == "i8" and cfg.pipe_imgs == 2
    assert cfg.pipe_imgs_t == 2      # explicit override reaches _t too
    assert cfg.loss_tile is None

    clean_env.setenv("SPATIALVAE_GSCALE", "bogus")
    with pytest.raises(ValueError, match="SPATIALVAE_GSCALE"):
        KernelConfig.from_env()


def test_trainer_rejects_offdefault_numerics(clean_env):
    check_numerics_default()                            # defaults: fine
    clean_env.setenv("SPATIALVAE_PIPE_IMGS", "4")       # perf-only: fine
    check_numerics_default()
    clean_env.setenv("SPATIALVAE_SR", "1")              # numerics: reject
    with pytest.raises(RuntimeError, match="sr"):
        check_numerics_default()
    clean_env.setenv("SPATIALVAE_ALLOW_KNOBS", "1")     # tools opt in
    check_numerics_default()


def test_trainer_construction_guard(clean_env):
    """A Trainer built under a stray numerics env var must fail loudly."""
    import jax.numpy as jnp

    from spatialvae_tpu.core.config import (
        InferenceConfig,
        SpatialGeneratorConfig,
    )
    from spatialvae_tpu.objectives import ElboConfig
    from spatialvae_tpu.train import Trainer, TrainConfig
    from spatialvae_tpu.transforms.coords import coord_grid

    clean_env.setenv("SPATIALVAE_TANH", "pade")
    q_cfg = InferenceConfig(n=64, latent_dim=5, hidden_dim=8, num_layers=2)
    p_cfg = SpatialGeneratorConfig(latent_dim=2, hidden_dim=8, num_layers=2)
    with pytest.raises(RuntimeError, match="tanh"):
        Trainer(q_cfg, p_cfg, ElboConfig(theta_prior=np.pi),
                TrainConfig(minibatch_size=8, num_epochs=1,
                            image_shape=(8, 8)),
                coord_grid(8, 8))


def test_numerics_fields_exist():
    names = {f for f in KernelConfig.__dataclass_fields__}
    assert set(NUMERICS_FIELDS) <= names


def test_kernel_dots_pin_explicit_precision():
    """Every dot_general/jnp.dot inside the Pallas kernel modules must
    pass an explicit precision: jax_default_matmul_precision is ambient
    process state (the CLI parity paths set 'highest'), and a leaked
    fp32 contract precision on an int4/int8 dot makes Mosaic reject the
    kernel with 'Bad lhs type' (round 5 — first CLI --int8-decoder run
    on real TPU hardware)."""
    import os
    import re

    kdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "spatialvae_tpu", "kernels")
    offenders = []
    for name in sorted(os.listdir(kdir)):
        if not name.endswith(".py"):
            continue
        src = open(os.path.join(kdir, name)).read()
        for m in re.finditer(r"jax\.lax\.dot_general\(|jnp\.dot\(", src):
            depth, i = 0, m.end() - 1
            while True:
                if src[i] == "(":
                    depth += 1
                elif src[i] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                i += 1
            if "precision" not in src[m.start():i + 1]:
                offenders.append(f"{name}:{src[:m.start()].count(chr(10)) + 1}")
    assert not offenders, (
        "kernel dots without an explicit precision= (ambient "
        f"jax_default_matmul_precision leaks in): {offenders}")
