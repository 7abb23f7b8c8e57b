#!/usr/bin/env python
"""Probe: can Mosaic emit an int16 (or bf16) accumulator from an int4/int8
MXU matmul?  The fused loss kernel's p1 phase reads the (Pt, H) i32 forward
accumulator — values are bounded by 7*7*512 = 25088 (fits i16 exactly), so
a narrower store would halve that read.  Run on TPU; prints which
preferred_element_type values compile and their scan-amortized time.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# measurement entry point: off-default kernel knobs are allowed
from spatialvae_tpu.kernels.config import allow_knobs
allow_knobs()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PT, H = 1024, 512


def main():
    from spatialvae_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    aq = jax.random.randint(key, (PT, H), -7, 8, jnp.int8)
    wq = jax.random.randint(key, (H, H), -7, 8, jnp.int8)

    for acc_dtype in (jnp.int32, jnp.int16, jnp.bfloat16, jnp.float32):
        name = jnp.dtype(acc_dtype).name

        def kern(a_ref, w_ref, o_ref, *, dt):
            out = jax.lax.dot_general(
                a_ref[:, :].astype(jnp.int4), w_ref[:, :].astype(jnp.int4),
                (((1,), (0,)), ((), ())), preferred_element_type=dt)
            # consume into a fixed f32 output so only the acc store differs
            o_ref[:, :] = out.astype(jnp.float32)

        try:
            f = pl.pallas_call(
                functools.partial(kern, dt=acc_dtype),
                grid=(64,),
                in_specs=[
                    pl.BlockSpec((PT, H), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((H, H), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((PT, H), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((PT, H), jnp.float32),
            )
            # scan-amortized (CLAUDE.md: never time single dispatches —
            # the tunnel adds ~10 ms/call; 100 iters pushes the residual
            # dispatch bias to ~0.1 ms/iter); legality is the real result
            iters = 100

            @jax.jit
            def jf(a, w):
                def body(c, _):
                    out = f(c, w)
                    return c + (out[0:1, 0:1] * 0).astype(c.dtype), ()
                return jax.lax.scan(body, a, None, length=iters)[0]

            r = jf(aq, wq)
            r.block_until_ready()
            t0 = time.perf_counter()
            r = jf(aq, wq)
            r.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
            print(f"acc={name}: OK  {dt * 1e3:.2f} ms/iter (scan-amortized)")
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:140]
            print(f"acc={name}: FAIL  {msg}")


if __name__ == "__main__":
    main()
