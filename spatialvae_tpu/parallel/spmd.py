"""shard_map data-parallel training step.

GSPMD cannot partition a ``pallas_call``, so under the default jit path the
fused decoder kernel is disabled on multi-chip meshes.  This module provides
the alternative: an explicitly-SPMD step via ``jax.shard_map`` where each
device runs the full (fused-kernel) step on its batch shard and gradients
are ``pmean``-ed over the 'data' axis — the classic DP recipe, with the
collective riding ICI.

Scope: pure data parallelism (mesh model axis = 1); tensor-parallel runs use
the GSPMD path with the XLA decoder.  Per-device RNG is decorrelated by
folding the device index into the step key.  Requires the global batch to
divide the data-axis size.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P


def make_spmd_step(trainer, mesh, *, fold_shard_key=None):
    """Un-jitted shard_map step for composition inside the epoch scan.

    train_step(state, y, ctf, key, z_scale) -> (state, metrics); the global
    batch must divide the 'data' axis size.

    fold_shard_key(key, shard_idx) -> key overrides the per-shard RNG
    decorrelation (explicit test hook — tests that need all shards to share
    a key pass ``lambda k, i: k`` instead of monkeypatching the global
    jax.random.fold_in)."""
    assert mesh.shape.get("model", 1) == 1, \
        "spmd step is DP-only; use the GSPMD path for model parallelism"

    fold = fold_shard_key if fold_shard_key is not None \
        else jax.random.fold_in
    grad_fn = jax.value_and_grad(trainer._loss, has_aux=True)
    optimizer = trainer.optimizer

    def per_device(state, y, ctf, key, z_scale, y_t, y_q8):
        """Mirrors the single-chip train_step (trainer._build_steps)
        including the round-2 throughput stack: the loss differentiates
        the bf16 shadow copy when present, the int8 encoder weights
        (qshadow) and prequantized data batch (y_q8) feed the int8 MXU,
        and the update runs through the SAME shared apply_update helper
        as the single-chip and tail steps — all per-device on replicated
        params, so every device emits identical state."""
        from spatialvae_tpu.train.trainer import apply_update, grad_target

        idx = jax.lax.axis_index("data")
        key = fold(key, idx)                   # decorrelate shard noise
        target, qq = grad_target(state)
        (_, aux), grads = grad_fn(
            target, y, ctf, key, z_scale, y_t=y_t, q_quant=qq,
            y_q8=y_q8 if state.shadow is not None else None)
        grads = jax.lax.pmean(grads, "data")   # global-batch gradient
        aux = jax.lax.pmean(aux, "data")       # equal shards -> exact mean
        return apply_update(optimizer, state, grads,
                            trainer._compute_dtype), aux

    def spec(state_like):
        return jax.tree_util.tree_map(lambda _: P(), state_like)

    def step(state, y, ctf, key, z_scale, y_t=None, y_q8=None):
        in_specs = (spec(state), P("data"),
                    P("data") if ctf is not None else None,
                    P(), P(),
                    P("data") if y_t is not None else None,
                    (P("data"), P()) if y_q8 is not None else None)
        out_specs = (spec(state), P())
        fn = jax.shard_map(per_device, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)
        return fn(state, y, ctf, key, z_scale, y_t, y_q8)

    return step


def make_spmd_train_step(trainer, mesh, *, fold_shard_key=None):
    """Jitted standalone variant of make_spmd_step."""
    return jax.jit(make_spmd_step(trainer, mesh,
                                  fold_shard_key=fold_shard_key))


def make_spmd_pixel_step(trainer, mesh, *, fold_shard_key=None):
    """DP x pixel-sharded shard_map training step (SURVEY §5.7 made
    trainer-reachable): batch shards over 'data', the fused int8 loss
    kernel's PIXEL axis over 'model'.

    Per (data, model) device: the encoder + pose fold run on the full
    batch shard (replicated over 'model' — the q network needs every
    pixel of its images), the kernel runs on this device's HW tile, and
    elbo_minibatch's pixel_axis hook psums the loss over 'model' so the
    metrics are exact while each device's gradient is its local tile
    partial (+ KL/n).  psum(grads, 'model') then sums the partials to the
    full gradient — algebraically the single-device computation with a
    different tile-accumulation order (parallel/pixel.py rationale) —
    and pmean over 'data' completes the classic DP reduction.  The Adam
    update + shadow/qshadow emission run on those identical reduced
    grads per device via the ONE shared apply_update.

    RNG: the step key is decorrelated per DATA shard only — every pixel
    shard of one data shard must draw the SAME reparameterisation noise
    (they decode one consistent pose).

    Requires: global batch % data-axis == 0, per-shard batch even, and
    can_pixel_shard(HW, model-axis) — the trainer gates on these."""
    assert mesh.shape.get("model", 1) > 1, \
        "pixel step needs a model axis; use make_spmd_step for pure DP"

    fold = fold_shard_key if fold_shard_key is not None \
        else jax.random.fold_in
    grad_fn = jax.value_and_grad(trainer._loss, has_aux=True)
    optimizer = trainer.optimizer

    def per_device(state, y, ctf, key, z_scale, y_t, y_q8, coords, mask):
        from spatialvae_tpu.train.trainer import apply_update, grad_target

        key = fold(key, jax.lax.axis_index("data"))
        target, qq = grad_target(state)
        (_, aux), grads = grad_fn(
            target, y, ctf, key, z_scale, y_t=y_t, q_quant=qq,
            y_q8=y_q8 if state.shadow is not None else None,
            coords=coords, mask=mask, pixel_axis="model")
        grads = jax.lax.psum(grads, "model")   # sum tile partials
        grads = jax.lax.pmean(grads, "data")   # global-batch gradient
        aux = jax.lax.pmean(aux, "data")       # already exact over 'model'
        return apply_update(optimizer, state, grads,
                            trainer._compute_dtype), aux

    def spec(state_like):
        return jax.tree_util.tree_map(lambda _: P(), state_like)

    def step(state, y, ctf, key, z_scale, y_t=None, y_q8=None):
        assert y_t is not None, \
            "pixel-sharded steps need the pre-transposed target copy"
        mask = trainer.mask
        in_specs = (spec(state), P("data"),
                    P("data") if ctf is not None else None,
                    P(), P(),
                    P("data", None, "model"),
                    (P("data"), P()) if y_q8 is not None else None,
                    P("model"),
                    P("model") if mask is not None else None)
        out_specs = (spec(state), P())
        fn = jax.shard_map(per_device, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)
        return fn(state, y, ctf, key, z_scale, y_t, y_q8,
                  trainer.coords, mask)

    return step


def make_spmd_eval_step(trainer, mesh):
    """Un-jitted shard_map EVAL step: each device runs the fused forward
    decoder on its batch shard.

    Without this, eval under a DP mesh forfeits the Pallas forward decoder
    entirely (GSPMD cannot partition a pallas_call, so the plain-jit eval
    falls back to the XLA decoder) — and the CLIs evaluate every epoch.
    Only the fused LOSS kernel stays off: eval needs no gradients, and the
    loss kernel's primal computes all five of them.

    The reparameterisation noise is drawn OUTSIDE the shard_map from the
    same key and (global-batch, inf_dim) shape the single-chip eval uses,
    then sharded over 'data' — so mesh eval matches single-chip eval up to
    shard-reduction reordering (tested in test_spmd.py)."""
    import dataclasses

    assert mesh.shape.get("model", 1) == 1, \
        "spmd eval is DP-only; use the GSPMD path for model parallelism"
    eval_ecfg = dataclasses.replace(trainer.ecfg, fused_loss=False)

    def per_device(params, y, ctf, key, z_scale, noise):
        _, aux = trainer._loss(params, y, ctf, key, z_scale,
                               ecfg=eval_ecfg, augment=False, noise=noise)
        return jax.lax.pmean(aux, "data")   # equal shards -> exact mean

    def spec(tree):
        return jax.tree_util.tree_map(lambda _: P(), tree)

    def step(params, y, ctf, key, z_scale):
        noise = jax.random.normal(
            key, (y.shape[0], trainer.q_cfg.latent_dim),
            dtype=trainer._compute_dtype)
        in_specs = (spec(params), P("data"),
                    P("data") if ctf is not None else None,
                    P(), P(), P("data"))
        fn = jax.shard_map(per_device, mesh=mesh, in_specs=in_specs,
                           out_specs=P(), check_vma=False)
        return fn(params, y, ctf, key, z_scale, noise)

    return step
