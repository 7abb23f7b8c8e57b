"""Fused Pallas decoder vs XLA folded path on the real TPU.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/kernel_probe.py [B]
"""

import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    return (time.perf_counter() - t0) / n


def main():
    from spatialvae_tpu.core.config import SpatialGeneratorConfig
    from spatialvae_tpu.kernels.fused_decoder import fused_spatial_generator
    from spatialvae_tpu.models import spatial_generator_init
    from spatialvae_tpu.models.spatial import spatial_generator_apply_folded
    from spatialvae_tpu.transforms.coords import coord_grid

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = m = 64
    z_dim = 20
    cfg = SpatialGeneratorConfig(latent_dim=z_dim, hidden_dim=500, n_out=3,
                                 num_layers=2)
    params = spatial_generator_init(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    coords = jnp.asarray(coord_grid(n, m))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    theta = jax.random.normal(k1, (B,), jnp.bfloat16)
    dx = 0.1 * jax.random.normal(k2, (B, 2), jnp.bfloat16)
    z = jax.random.normal(k3, (B, z_dim), jnp.bfloat16)

    hw = n * m

    def check(ya, yb, label):
        d = jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)))
        print(f"  {label} max|diff| = {float(d):.2e}")

    # forward
    f_x = jax.jit(lambda p: spatial_generator_apply_folded(
        p, cfg, coords.astype(jnp.bfloat16), theta, dx, z))
    f_p = jax.jit(lambda p: fused_spatial_generator(
        p, cfg, coords, theta, dx, z))
    ya, yb = f_x(params), f_p(params)
    check(ya, yb, "fwd")
    tx, tp = timeit(f_x, params), timeit(f_p, params)
    print(f"fwd  XLA {tx*1e3:7.2f} ms   Pallas {tp*1e3:7.2f} ms   "
          f"speedup {tx/tp:.2f}x")

    # forward+backward
    def loss_x(p, th, d_, zz):
        y = spatial_generator_apply_folded(p, cfg,
                                           coords.astype(jnp.bfloat16),
                                           th, d_, zz)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_p(p, th, d_, zz):
        y = fused_spatial_generator(p, cfg, coords, th, d_, zz)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_x = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2, 3)))
    g_p = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2, 3)))
    ga = g_x(params, theta, dx, z)
    gb = g_p(params, theta, dx, z)
    for (pa, pb, name) in [(ga[0]["layers"][0]["w"], gb[0]["layers"][0]["w"],
                            "dW1"),
                           (ga[1], gb[1], "dtheta"), (ga[3], gb[3], "dz")]:
        check(pa, pb, name)
    tx, tp = timeit(g_x, params, theta, dx, z), timeit(g_p, params, theta,
                                                       dx, z)
    print(f"grad XLA {tx*1e3:7.2f} ms   Pallas {tp*1e3:7.2f} ms   "
          f"speedup {tx/tp:.2f}x")
    flops = B * hw * (2 * 500 * 500 + 2 * 500 * 3) * 3
    print(f"grad Pallas ~{flops/tp/1e12:.1f} TFLOPS effective")


if __name__ == "__main__":
    main()
