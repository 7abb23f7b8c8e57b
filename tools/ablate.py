"""Scan-amortized ablation of the galaxy train step on the real TPU.

Each variant runs a 16-step lax.scan inside one jit (dispatch overhead
amortized; per-step numbers are trustworthy, unlike single-call timings
through the axon tunnel).

Run: python tools/ablate.py
"""

import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

# measurement entry point: off-default kernel knobs are allowed
from spatialvae_tpu.kernels.config import allow_knobs
allow_knobs()
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax import lax


def scan_timer(step_fn, state, keys, label, steps):
    @jax.jit
    def run(state, keys):
        def body(c, k):
            c, l = step_fn(c, k)
            return c, l
        return lax.scan(body, state, keys)

    t0 = time.perf_counter()
    out, ls = run(state, keys)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), ls)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out, ls = run(state, keys)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), ls)
    dt = (time.perf_counter() - t0) / steps
    print(f"{label:34s} {dt*1e3:7.2f} ms/step   (compile {compile_s:.0f}s)")
    return dt


def main():
    from spatialvae_tpu.core.config import (
        InferenceConfig,
        SpatialGeneratorConfig,
    )
    from spatialvae_tpu.models import (
        inference_apply,
        inference_init,
        spatial_generator_init,
    )
    from spatialvae_tpu.models.spatial import spatial_generator_apply_folded
    from spatialvae_tpu.objectives import ElboConfig, elbo_minibatch
    from spatialvae_tpu.transforms.coords import coord_grid

    n = m = 64
    C = 3
    zd = 20
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = 16
    q_cfg = InferenceConfig(n=n * m * C, latent_dim=zd + 3, hidden_dim=5000,
                            num_layers=2)
    p_cfg = SpatialGeneratorConfig(latent_dim=zd, hidden_dim=500, n_out=C,
                                   num_layers=2)
    ecfg = ElboConfig(theta_prior=np.pi, likelihood="bernoulli", channels=C)
    coords = jnp.asarray(coord_grid(n, m))

    kq, kp, ky = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {"q": inference_init(kq, q_cfg), "p": spatial_generator_init(kp, p_cfg)}
    y = jax.random.uniform(ky, (B, n * m, C))
    opt = optax.adam(1e-4)
    keys = jax.random.split(jax.random.PRNGKey(1), steps)

    bf = jnp.bfloat16

    def cast(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(bf) if a.dtype == jnp.float32 else a, t)

    def full_loss(p, k, fused=False, remat=False):
        import dataclasses
        e = dataclasses.replace(ecfg, fused=fused)
        fn = lambda pp: elbo_minibatch(cast(pp["q"]), cast(pp["p"]), q_cfg,
                                       p_cfg, e, coords.astype(bf),
                                       y.astype(bf), k)[0]
        if remat:
            fn = jax.checkpoint(fn)
        return (-fn(p).astype(jnp.float32), 0.0)

    def make_step(loss):
        def step(c, k):
            p, o = c
            (l, _), g = jax.value_and_grad(loss, has_aux=True)(p, k)
            g = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), g)
            u, o = opt.update(g, o, p)
            return (optax.apply_updates(p, u), o), l
        return step

    state = (params, opt.init(params))

    # 1. full step (XLA folded decoder)
    scan_timer(make_step(lambda p, k: full_loss(p, k)), state, keys,
               f"full step XLA  B={B}", steps)

    # 2. full step, fused Pallas decoder
    scan_timer(make_step(lambda p, k: full_loss(p, k, fused=True)), state,
               keys, f"full step Pallas B={B}", steps)

    # 3. full step with remat over the whole loss
    scan_timer(make_step(lambda p, k: full_loss(p, k, remat=True)), state,
               keys, f"full step XLA remat B={B}", steps)

    # 4. encoder-only + adam
    def enc_loss(p, k):
        mu, ls = inference_apply(cast(p["q"]), q_cfg,
                                 y.reshape(B, -1).astype(bf))
        return (jnp.sum(mu.astype(jnp.float32) ** 2)
                + jnp.sum(ls.astype(jnp.float32) ** 2), 0.0)

    scan_timer(make_step(enc_loss), state, keys, "encoder+adam", steps)

    # 5. decoder-only + adam
    zfix = jax.random.normal(jax.random.PRNGKey(2), (B, zd), bf)
    tfix = jax.random.normal(jax.random.PRNGKey(3), (B,), bf)
    dfix = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (B, 2), bf)

    def dec_loss(p, k):
        yh = spatial_generator_apply_folded(cast(p["p"]), p_cfg,
                                            coords.astype(bf), tfix, dfix,
                                            zfix)
        return (jnp.sum(yh.astype(jnp.float32) ** 2), 0.0)

    scan_timer(make_step(dec_loss), state, keys, "decoder+adam XLA", steps)

    # 6. fused decoder-only + adam
    from spatialvae_tpu.kernels.fused_decoder import fused_spatial_generator

    def dec_loss_fused(p, k):
        yh = fused_spatial_generator(cast(p["p"]), p_cfg, coords, tfix, dfix,
                                     zfix)
        return (jnp.sum(yh.astype(jnp.float32) ** 2), 0.0)

    scan_timer(make_step(dec_loss_fused), state, keys,
               "decoder+adam Pallas", steps)

    # 7. adam-only
    def null_loss(p, k):
        return (jnp.sum(p["p"]["coord"]["b"] ** 2), 0.0)

    scan_timer(make_step(null_loss), state, keys, "adam-only", steps)


if __name__ == "__main__":
    main()
