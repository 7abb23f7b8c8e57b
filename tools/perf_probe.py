"""Decompose train-step time: forward, forward+backward, optimizer, variants.

Run on the TPU: python tools/perf_probe.py [batch]
"""

import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, out)
    return (time.perf_counter() - t0) / n


def main():
    from spatialvae_tpu.core.config import (
        InferenceConfig,
        SpatialGeneratorConfig,
    )
    from spatialvae_tpu.objectives import ElboConfig
    from spatialvae_tpu.train import Trainer, TrainConfig
    from spatialvae_tpu.transforms.coords import coord_grid

    n = m = 64
    C = 3
    z = 20
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    q = InferenceConfig(n=n * m * C, latent_dim=z + 3, hidden_dim=5000,
                        num_layers=2)
    p = SpatialGeneratorConfig(latent_dim=z, hidden_dim=500, n_out=C,
                               num_layers=2)
    e = ElboConfig(theta_prior=np.pi, likelihood="bernoulli", channels=C)
    t = TrainConfig(minibatch_size=B, num_epochs=1, seed=0,
                    compute_dtype="bfloat16", image_shape=(n, m), channels=C)
    tr = Trainer(q, p, e, t, coord_grid(n, m))

    key = jax.random.PRNGKey(0)
    y = jax.random.uniform(key, (B, n * m, C))
    zs = jnp.asarray(1.0, jnp.float32)
    params = tr.state.params

    fwd = jax.jit(lambda pa, yy, kk: tr._loss(pa, yy, None, kk, zs)[0])
    print(f"B={B}")
    print(f"forward only:      {timeit(fwd, params, y, key)*1e3:8.2f} ms")

    grad = jax.jit(jax.value_and_grad(
        lambda pa, yy, kk: tr._loss(pa, yy, None, kk, zs)[0]))
    print(f"forward+backward:  {timeit(grad, params, y, key)*1e3:8.2f} ms")

    opt = tr.optimizer
    opt_state = opt.init(params)

    @jax.jit
    def adam_only(pa, os_, g):
        u, os2 = opt.update(g, os_, pa)
        return optax.apply_updates(pa, u), os2

    _, g = grad(params, y, key)
    print(f"adam update only:  {timeit(adam_only, params, opt_state, g)*1e3:8.2f} ms")

    step = timeit(lambda s, yy, kk: tr._train_step(s, yy, None, kk, zs),
                  tr.state, y, key)
    print(f"full train step:   {step*1e3:8.2f} ms  -> {B/step:,.0f} img/s")

    # decoder-only probe: folded spatial generator fwd+bwd
    from spatialvae_tpu.models.spatial import spatial_generator_apply_folded

    coords = jnp.asarray(coord_grid(n, m), jnp.bfloat16)
    pp = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                tr.state.params["p"])
    theta = jax.random.normal(key, (B,), jnp.bfloat16)
    dx = jax.random.normal(key, (B, 2), jnp.bfloat16) * 0.1
    zz = jax.random.normal(key, (B, z), jnp.bfloat16)

    dec_fwd = jax.jit(lambda pa: jnp.sum(
        spatial_generator_apply_folded(pa, p, coords, theta, dx, zz)
        .astype(jnp.float32)))
    print(f"decoder fwd:       {timeit(dec_fwd, pp)*1e3:8.2f} ms")
    dec_grad = jax.jit(jax.grad(lambda pa: jnp.sum(
        spatial_generator_apply_folded(pa, p, coords, theta, dx, zz)
        .astype(jnp.float32))))
    print(f"decoder fwd+bwd:   {timeit(dec_grad, pp)*1e3:8.2f} ms")

    # encoder-only probe
    from spatialvae_tpu.models import inference_apply

    qq = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                tr.state.params["q"])
    yb = y.reshape(B, -1).astype(jnp.bfloat16)
    enc_grad = jax.jit(jax.grad(lambda pa: jnp.sum(
        inference_apply(pa, q, yb)[0].astype(jnp.float32))))
    print(f"encoder fwd+bwd:   {timeit(enc_grad, qq)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
