#!/usr/bin/env python
"""Epoch-context gather ablation (TPU): is the ~5 ms/step in-epoch kernel
delta (profiler 85.7 ms vs 80.6 isolated at B=4096, BASELINE.md round 3)
caused by the per-step dataset gathers sharing HBM with the kernel?

Three scans over the REAL train step (same donated-free jit context):

  const    — no gathers: one batch closed over, reused every step.
             Upper bound on what any gather restructuring can recover.
  gather   — the trainer's epoch-scan semantics: per-step jnp.take of
             y/y_t/y_q8 with a (steps, B) index matrix.
  slice    — gathers hoisted to ONE pre-permute pass before the scan
             (same bytes, between-epochs), steps read contiguous
             dynamic slices.

Run: python tools/probe_gather.py [batch=4096] [steps=16]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# measurement entry point: off-default kernel knobs are allowed
from spatialvae_tpu.kernels.config import allow_knobs
allow_knobs()

import numpy as np


def main():
    batch, steps = 4096, 16
    for a in sys.argv[1:]:
        k, v = a.split("=")
        if k == "batch":
            batch = int(v)
        elif k == "steps":
            steps = int(v)

    from spatialvae_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from spatialvae_tpu.core.config import (
        InferenceConfig,
        SpatialGeneratorConfig,
    )
    from spatialvae_tpu.data import ArrayDataset
    from spatialvae_tpu.objectives import ElboConfig
    from spatialvae_tpu.train import Trainer, TrainConfig
    from spatialvae_tpu.transforms.coords import coord_grid

    n = m = 64
    channels = 3
    z_dim = 20
    q_cfg = InferenceConfig(n=n * m * channels, latent_dim=z_dim + 3,
                            hidden_dim=5000, num_layers=2)
    p_cfg = SpatialGeneratorConfig(latent_dim=z_dim, hidden_dim=500,
                                   n_out=channels, num_layers=2)
    ecfg = ElboConfig(rotate=True, translate=True, theta_prior=np.pi,
                      likelihood="bernoulli", channels=channels, fused=True,
                      int8=True)
    tcfg = TrainConfig(minibatch_size=batch, learning_rate=1e-4,
                       num_epochs=1, seed=0, compute_dtype="bfloat16",
                       image_shape=(n, m), channels=channels)
    trainer = Trainer(q_cfg, p_cfg, ecfg, tcfg, coord_grid(n, m))

    n_images = batch * steps
    key = jax.random.PRNGKey(0)
    y = jax.random.uniform(key, (n_images, n * m, channels),
                           dtype=jnp.bfloat16)
    ds = ArrayDataset(y)
    data_t = trainer._dataset_yt(ds)
    data_q8 = trainer._dataset_yq8(ds)
    assert trainer._wants_yt(ds) and trainer._wants_yq8(ds)

    state = trainer._seeded_state()
    zs = jnp.asarray(1.0, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), steps)
    idx = jax.random.permutation(jax.random.PRNGKey(2), n_images)
    idx = idx[:steps * batch].reshape(steps, batch)

    step = trainer._train_step        # jitted; inlines inside the scans

    y0 = jnp.take(y, idx[0], axis=0, mode="clip")
    yt0 = jnp.take(data_t, idx[0], axis=0, mode="clip")
    yq0 = (jnp.take(data_q8[0], idx[0], axis=0, mode="clip"), data_q8[1])
    sq8 = data_q8[1]

    # dataset-sized arrays MUST be jit ARGUMENTS: closed-over jax.Arrays
    # become compile-time constants and the compiler chokes embedding GBs
    # into the HLO (a cold lesson — 48 min of compile before this fix)

    @jax.jit
    def run_const(state, keys, y0, yt0, yq0):
        def body(c, k):
            c, aux = step(c, y0, None, k, zs, yt0, yq0)
            return c, aux
        return lax.scan(body, state, keys)

    @jax.jit
    def run_gather(state, keys, idx, y, data_t, q8, sq8):
        def body(c, ki):
            k, ib = ki
            yb = jnp.take(y, ib, axis=0, mode="clip")
            ytb = jnp.take(data_t, ib, axis=0, mode="clip")
            yqb = (jnp.take(q8, ib, axis=0, mode="clip"), sq8)
            c, aux = step(c, yb, None, k, zs, ytb, yqb)
            return c, aux
        return lax.scan(body, state, (keys, idx))

    @jax.jit
    def run_slice(state, keys, perm, y, data_t, q8, sq8):
        # one pre-permute pass (between-epochs bytes), contiguous reads
        yp = jnp.take(y, perm, axis=0, mode="clip")
        ytp = jnp.take(data_t, perm, axis=0, mode="clip")
        yqp = jnp.take(q8, perm, axis=0, mode="clip")

        def body(c, ki):
            k, i = ki
            s = i * batch
            yb = lax.dynamic_slice_in_dim(yp, s, batch)
            ytb = lax.dynamic_slice_in_dim(ytp, s, batch)
            yqb = (lax.dynamic_slice_in_dim(yqp, s, batch), sq8)
            c, aux = step(c, yb, None, k, zs, ytb, yqb)
            return c, aux
        return lax.scan(body, state, (keys, jnp.arange(steps)))

    perm = idx.reshape(-1)

    def timed(label, fn, *args):
        t0 = time.perf_counter()
        st, aux = fn(*args)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), aux)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        st, aux = fn(*args)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), aux)
        dt = (time.perf_counter() - t0) / steps
        print(f"{label:10s} {dt * 1e3:7.2f} ms/step  "
              f"({batch / dt:.0f} img/s, compile {compile_s:.0f}s)",
              flush=True)
        return dt

    timed("const", run_const, state, keys, y0, yt0, yq0)
    timed("gather", run_gather, state, keys, idx, y, data_t,
          data_q8[0], sq8)
    timed("slice", run_slice, state, keys, perm, y, data_t,
          data_q8[0], sq8)


if __name__ == "__main__":
    main()
