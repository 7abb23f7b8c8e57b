#!/usr/bin/env python
"""Probe: does the fused loss kernel time depend on how its operands reach
it?  kernel_bench closes w1/b1/wht/y_t over the jit (jaxpr CONSTANTS);
the real epoch passes them as loop-carried values and gathers y_t per
step.  The jax.profiler step anatomy shows the in-epoch kernel ~6% slower
than the isolated number (85.6 vs 80.6 ms at B=4096) — this isolates
whether that is operand-provenance (layouts/constant placement) or
genuine epoch-context cost.

Modes (all B=2048, pt=1024, defaults):
  consts — operands closed over (kernel_bench behaviour, expect ~40.3)
  args   — operands are jit parameters threaded through the scan
  gather — y_t additionally gathered from an (N, No, HW) dataset copy by
           a per-step index batch (the epoch's access pattern)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# measurement entry point: off-default kernel knobs are allowed
from spatialvae_tpu.kernels.config import allow_knobs
allow_knobs()

import jax
import jax.numpy as jnp

B, HW, H, NO = 2048, 4096, 500, 3


def main():
    from spatialvae_tpu.core.cache import enable_compilation_cache
    from spatialvae_tpu.kernels.fused_loss_int8 import _lossgrad_pallas

    enable_compilation_cache()
    iters = 30
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    fold = jax.random.normal(ks[0], (B, 4, H), jnp.float32)
    coords = jax.random.normal(ks[1], (HW, 2), jnp.float32)
    w1 = jax.random.normal(ks[2], (H, H), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[3], (H,), jnp.float32)[None, :] * 0.1
    wht = jax.random.normal(ks[4], (NO, H), jnp.float32) * 0.1
    bht = jax.random.normal(ks[5], (NO,), jnp.float32)[:, None] * 0.1
    y_t = jax.random.uniform(ks[6], (B, NO, HW), jnp.bfloat16)
    n_data = 4 * B
    data_t = jax.random.uniform(ks[7], (n_data, NO, HW), jnp.bfloat16)
    idx = jax.random.randint(key, (iters, B), 0, n_data)

    def tick(label, run, *args):
        r = run(*args)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)
        t0 = time.perf_counter()
        r = run(*args)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:8s} {dt * 1e3:7.2f} ms/iter", flush=True)

    # consts: everything but fold closed over
    @jax.jit
    def run_consts(f0):
        def body(c, _):
            outs = _lossgrad_pallas(c, coords, w1, b1, wht, bht, y_t)
            return c + (outs[1][0, 0] * 0), ()
        return jax.lax.scan(body, f0, None, length=iters)[0]

    tick("consts", run_consts, fold)

    # args: operands are jit parameters (the epoch's situation for
    # w1/wht — they update every step — and y_t via the carry)
    @jax.jit
    def run_args(f0, w1a, b1a, whta, bhta, yta):
        def body(c, _):
            outs = _lossgrad_pallas(c, coords, w1a, b1a, whta, bhta, yta)
            return c + (outs[1][0, 0] * 0), ()
        return jax.lax.scan(body, f0, None, length=iters)[0]

    tick("args", run_args, fold, w1, b1, wht, bht, y_t)

    # gather: y_t gathered per step from a dataset copy (epoch pattern)
    @jax.jit
    def run_gather(f0, w1a, b1a, whta, bhta, dt_, ix):
        def body(c, ib):
            yt = jnp.take(dt_, ib, axis=0, mode="clip")
            outs = _lossgrad_pallas(c, coords, w1a, b1a, whta, bhta, yt)
            return c + (outs[1][0, 0] * 0), ()
        return jax.lax.scan(body, f0, ix)[0]

    tick("gather", run_gather, fold, w1, b1, wht, bht, data_t, idx)


if __name__ == "__main__":
    main()
