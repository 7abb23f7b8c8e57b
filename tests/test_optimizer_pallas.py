"""Pallas update+apply Adam must match the XLA fused_adam path."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from spatialvae_tpu.train.optimizer import fused_adam
from spatialvae_tpu.train.optimizer_pallas import fused_adam_pallas


import pytest


@pytest.mark.parametrize("kernel", ["0", "1"])
def test_pallas_adam_matches_fused_adam(kernel, monkeypatch):
    monkeypatch.setenv("SPATIALVAE_PALLAS_ADAM", kernel)
    lr = 1e-3
    base = fused_adam(lr)
    pal = fused_adam_pallas(lr, interpret=True)

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    # one leaf above the kernel threshold (1M elems), plus small ones
    params = {
        "big": jax.random.normal(ks[0], (1024, 1100), jnp.float32),
        "small_w": jax.random.normal(ks[1], (32, 16), jnp.float32),
        "b": jax.random.normal(ks[2], (16,), jnp.float32),
    }
    state_a = base.init(params)
    state_b = pal.init(params)
    p_a, p_b = params, params

    for i in range(3):
        grads = jax.tree_util.tree_map(
            lambda p, k=ks[3 + i]: 0.1 * jax.random.normal(
                jax.random.fold_in(k, p.size), p.shape, p.dtype), p_a)
        updates, state_a = base.update(grads, state_a, p_a)
        p_a = optax.apply_updates(p_a, updates)
        p_b, state_b = pal.update_apply(grads, state_b, p_b)

    for a, b in zip(jax.tree_util.tree_leaves(p_a),
                    jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.mu),
                    jax.tree_util.tree_leaves(state_b.mu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.nu),
                    jax.tree_util.tree_leaves(state_b.nu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_shadow_epoch_matches_classic():
    """A full epoch through the bf16 shadow-params path (Pallas Adam in
    interpret mode) must track the classic cast-per-step path closely."""
    from spatialvae_tpu.core.config import (
        InferenceConfig,
        SpatialGeneratorConfig,
    )
    from spatialvae_tpu.data import ArrayDataset
    from spatialvae_tpu.objectives import ElboConfig
    from spatialvae_tpu.train import Trainer, TrainConfig
    from spatialvae_tpu.train.trainer import TrainState
    from spatialvae_tpu.transforms.coords import coord_grid

    n = m = 8
    q_cfg = InferenceConfig(n=n * m, latent_dim=5, hidden_dim=16,
                            num_layers=2)
    p_cfg = SpatialGeneratorConfig(latent_dim=2, hidden_dim=16, n_out=1,
                                   num_layers=2)
    ecfg = ElboConfig(theta_prior=np.pi)
    tcfg = TrainConfig(minibatch_size=8, learning_rate=1e-3, num_epochs=1,
                       seed=0, compute_dtype="bfloat16", image_shape=(n, m))

    def build():
        return Trainer(q_cfg, p_cfg, ecfg, tcfg, coord_grid(n, m))

    y = jax.random.uniform(jax.random.PRNGKey(5), (32, n * m))
    data = ArrayDataset(y)

    t_classic = build()
    e_classic = t_classic.train_epoch(data, 0, progress=False)

    t_shadow = build()
    t_shadow.optimizer = fused_adam_pallas(tcfg.learning_rate,
                                           interpret=True)
    t_shadow.state = TrainState(t_shadow.state.params,
                                t_shadow.optimizer.init(
                                    t_shadow.state.params))
    t_shadow._build_steps()
    t_shadow._use_shadow = True
    e_shadow = t_shadow.train_epoch(data, 0, progress=False)

    # same data, same keys; bf16 grads vs f32 grads differ at bf16
    # resolution, so epoch metrics agree loosely but tightly enough to
    # prove the path is wired correctly
    np.testing.assert_allclose(e_shadow[0], e_classic[0], rtol=2e-3)
    assert t_shadow.state.shadow is not None
    # shadow tracks the f32 masters
    for s, p in zip(jax.tree_util.tree_leaves(t_shadow.state.shadow),
                    jax.tree_util.tree_leaves(t_shadow.state.params)):
        assert s.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(s, np.float32),
                                   np.asarray(p, np.float32), atol=1e-2)


def test_pallas_adam_bf16_grads():
    """Mixed-precision grads upcast inside the kernel, like fused_adam."""
    lr = 1e-4
    pal = fused_adam_pallas(lr, interpret=True)
    base = fused_adam(lr)
    p = {"w": jnp.ones((1024, 1024), jnp.float32)}
    g = {"w": (0.01 * jnp.ones((1024, 1024))).astype(jnp.bfloat16)}
    sa = base.init(p)
    sb = pal.init(p)
    updates, sa = base.update(g, sa, p)
    p_a = optax.apply_updates(p, updates)
    p_b, sb = pal.update_apply(g, sb, p)
    np.testing.assert_allclose(np.asarray(p_a["w"]), np.asarray(p_b["w"]),
                               rtol=1e-6)


@pytest.mark.parametrize("moments", ["f32", "bf16"])
def test_adam_emit_kernel_single_pass(moments, monkeypatch):
    """The single-pass Adam+emit kernel (stale quant scale carried via
    qshadow['ns']) must match the XLA path exactly on m'/v'/p'/shadow,
    quantize with the CARRIED scale, and emit the fresh abs-max."""
    monkeypatch.setenv("SPATIALVAE_ADAM_MOMENTS", moments)
    from spatialvae_tpu.train.optimizer_pallas import quantize_leaf

    lr = 1e-3
    pal = fused_adam_pallas(lr, interpret=True)
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    params = {
        # kernel-eligible leaf (rows divide by 8)
        "w1": jax.random.normal(ks[0], (64, 300), jnp.float32),
        # rows indivisible by 8 -> XLA fallback, same leaf structure
        "w2": jax.random.normal(ks[1], (13, 16), jnp.float32),
        "b": jax.random.normal(ks[2], (16,), jnp.float32),
    }
    prev = jax.tree_util.tree_map(
        lambda p: quantize_leaf(p, p.ndim == 2), params)
    grads = jax.tree_util.tree_map(
        lambda p, k=ks[3]: 0.1 * jax.random.normal(
            jax.random.fold_in(k, p.size), p.shape, p.dtype), params)

    sa = pal.init(params)
    sb = pal.init(params)
    monkeypatch.setenv("SPATIALVAE_ADAM_EMIT", "pallas")
    p_a, st_a, sh_a, q_a = pal.update_apply(
        grads, sa, params, shadow_dtype=jnp.bfloat16, quant_min_elems=1,
        prev_quant=prev)
    monkeypatch.setenv("SPATIALVAE_ADAM_EMIT", "xla")
    p_b, st_b, sh_b, q_b = pal.update_apply(
        grads, sb, params, shadow_dtype=jnp.bfloat16, quant_min_elems=1,
        prev_quant=prev)

    for a, b in zip(jax.tree_util.tree_leaves((p_a, st_a.mu, st_a.nu)),
                    jax.tree_util.tree_leaves((p_b, st_b.mu, st_b.nu))):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(sh_a),
                    jax.tree_util.tree_leaves(sh_b)):
        assert a.dtype == b.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))

    # kernel leaf: q uses the CARRIED (stale) scale, ns is the fresh max
    e = q_a["w1"]
    p2 = np.asarray(p_a["w1"], np.float32)
    s_in = np.asarray(prev["w1"]["ns"], np.float32)
    np.testing.assert_array_equal(np.asarray(e["s"]), s_in)
    ref_q = np.clip(np.round(p2 / s_in[0, 0]), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(e["q"]), ref_q)
    np.testing.assert_allclose(np.asarray(e["ns"])[0, 0],
                               np.abs(p2).max() / 127.0 + 1e-30,
                               rtol=1e-6)
    # fallback leaf keeps the fresh-scale convention; q agrees with its s
    f = q_b["w2"]
    p2b = np.asarray(p_b["w2"], np.float32)
    np.testing.assert_allclose(np.asarray(f["s"])[0, 0],
                               np.abs(p2b).max() / 127.0 + 1e-30,
                               rtol=1e-6)
