#!/usr/bin/env python
"""Probe: does XLA (outside Pallas) lower int4 dot_general on this TPU,
and at what rate, at the ENCODER's GEMM shapes?

The fused decoder kernel already rides the int4 MXU (Mosaic lowers
(1,0)/(1,1) int4 contractions at ~1.74x the int8 rate — tools/probe_int4.py).
The encoder's big GEMMs (nn/qlinear.py) run at the XLA level instead:
  W1 fwd : (B, N) x (N, H)   (1,0)      N=12288, H=5000
  W2 fwd : (B, H) x (H, H)   (1,0)
  dW     : (B, N)^T x (B, H) (0,0)      [Mosaic rejects (0,0) int4]
  dx     : (B, H) x (H, H)^T (1,1)
If XLA lowers int4 at ~2x int8 for these, the encoder MXU time (~2 ms of
the 7.7 ms non-kernel residue at B=4096) halves.  Also probes whether int4
HBM arrays are materializable at the XLA level (the Pallas runtime said
UNIMPLEMENTED) — if not, operands must be stored int8 and cast in-graph,
and the cast cost is part of the measurement.

Usage: python tools/probe_xla_int4.py [b=4096] [n=12288] [h=5000] [iters=30]
(tiny-shape CPU smoke: python tools/probe_xla_int4.py cpu=1 \
 b=64 n=128 h=128 iters=2)

MEASURED (v5e, 2026-08-19, b=4096):
  w1-i8 1.399 ms (~int8 MXU peak)   w1-i4cast 2.256   w1-i8xi4 2.623
  w1-bf16 2.519                      w2-i8 0.334       w2-i4cast 0.515
  dw1-i8(0,0) 0.929                  dw1-i4(0,0) 2.429
  dx-i8(1,1) 0.496                   dx-i4(1,1) 0.347  <- only int4 win
  int4 HBM arrays materialize OK as jit OUTPUTS, but feeding one back in
  as a jit ARGUMENT hits a plugin RecursionError — int4 weights cannot be
  Adam-emitted and stored like the int8 qshadow copies.
VERDICT: XLA int4 is a NET LOSS for the encoder — the in-graph int8->int4
cast costs more than the MXU saves everywhere except the (1,1) dx
backward (~0.15 ms/step at B=4096, and dx is only needed for the decoder
cotangent path which the fused kernel already owns).  Encoder stays int8.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# measurement entry point: off-default kernel knobs are allowed
from spatialvae_tpu.kernels.config import allow_knobs
allow_knobs()

import jax
import jax.numpy as jnp

N, H = 12288, 5000


def scan_time(name, fn, args, iters, per_img=4096):
    """Scan-amortized timing; the output feeds a MAX (a sum-consumed dot
    is algebraically rewritten to (colsum A) @ (rowsum B) — the exact trap
    the body comment documents) scaled by a RUNTIME zero argument so
    constant folding cannot DCE the GEMM.  Operands are jit ARGUMENTS
    (closed-over jax.Arrays embed as compile-time constants — see the
    round-4 48-min-compile gotcha)."""

    def run_fn(zero, *ops):
        # Two elimination traps, both hit on the first TPU runs of this
        # probe (0.002 ms/iter = 2.5e17 FLOP/s):
        #  1. a literal `* 0` constant-folds and the dot DCEs — `zero` is
        #     a RUNTIME f32 argument holding 0.0;
        #  2. a dot consumed ONLY by a full reduce-sum gets algebraically
        #     rewritten to (colsum A) @ (rowsum B) — O(BNH) -> O(NH).
        #     max() cannot be pushed through a dot, so consume with max.
        def body(carry, _):
            out = fn(carry, *ops[1:])
            bump = (jnp.max(out.astype(jnp.float32)) * zero
                    ).astype(carry.dtype)
            return carry + bump, ()

        return jax.lax.scan(body, ops[0], None, length=iters)[0]

    run = jax.jit(run_fn)
    zero = jnp.float32(0.0)
    args = (zero,) + tuple(args)

    def sync(arr):
        # block_until_ready does NOT wait for execution under the axon
        # tunnel for these programs (measured: 0.1 ms "total" for a 90 ms
        # scan) — only a real device->host readback synchronizes.  Slice
        # a scalar so the transfer itself is tiny.
        return float(jnp.max(arr[:1, :1]).astype(jnp.float32))

    try:
        sync(run(*args))          # remote compile + first exec
        sync(run(*args))          # warm steady-state
    except Exception as e:  # noqa: BLE001 — probe tool, report and move on
        print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:240]}",
              flush=True)
        return None
    # calibrate dispatch+readback overhead on an already-ready array and
    # time the scan — min-of-k for both, so the ~10 ms/call tunnel jitter
    # (observed ovh spread 25-40 ms) cannot shift these ~1 ms/iter GEMM
    # numbers by several percent
    def min_of(k, thunk):
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            thunk()
            best = min(best, time.perf_counter() - t0)
        return best

    overhead = min_of(3, lambda: sync(args[1]))
    dt = max(min_of(3, lambda: sync(run(*args))) - overhead, 1e-9) / iters
    print(f"{name:16s} {dt * 1e3:7.3f} ms/iter "
          f"({per_img / dt:9.0f} img-equiv/s)  [ovh {overhead*1e3:.1f} ms]",
          flush=True)
    return dt


def main():
    global N, H
    b = 4096
    iters = 30
    for a in sys.argv[1:]:
        k, v = a.split("=")
        if k == "b":
            b = int(v)
        elif k == "n":
            N = int(v)
        elif k == "h":
            H = int(v)
        elif k == "iters":
            iters = int(v)
        elif k == "cpu" and v == "1":
            # the axon plugin ignores JAX_PLATFORMS=cpu from the env;
            # only the config API forces CPU (CLAUDE.md quirks)
            jax.config.update("jax_platforms", "cpu")

    from spatialvae_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    x8 = jnp.clip(jnp.round(jax.random.normal(ks[0], (b, N)) * 60),
                  -127, 127).astype(jnp.int8)
    w8 = jnp.clip(jnp.round(jax.random.normal(ks[1], (N, H)) * 60),
                  -127, 127).astype(jnp.int8)
    h8 = jnp.clip(jnp.round(jax.random.normal(ks[2], (b, H)) * 60),
                  -127, 127).astype(jnp.int8)
    v8 = jnp.clip(jnp.round(jax.random.normal(ks[3], (H, H)) * 60),
                  -127, 127).astype(jnp.int8)
    # 4-bit-valued int8 carriers (casting is then value-exact)
    x4 = jnp.clip(jnp.round(jax.random.normal(ks[0], (b, N)) * 3),
                  -7, 7).astype(jnp.int8)
    w4 = jnp.clip(jnp.round(jax.random.normal(ks[1], (N, H)) * 3),
                  -7, 7).astype(jnp.int8)
    h4 = jnp.clip(jnp.round(jax.random.normal(ks[2], (b, H)) * 3),
                  -7, 7).astype(jnp.int8)
    v4 = jnp.clip(jnp.round(jax.random.normal(ks[3], (H, H)) * 3),
                  -7, 7).astype(jnp.int8)

    print(f"# b={b} N={N} H={H} iters={iters} "
          f"backend={jax.default_backend()}")

    # --- can int4 live in HBM at the XLA level? ---------------------------
    try:
        w4dev = jax.jit(lambda w: w.astype(jnp.int4))(w4)
        w4dev.block_until_ready()
        print(f"int4 HBM array: OK shape={w4dev.shape} dtype={w4dev.dtype} "
              f"nbytes={w4dev.nbytes}", flush=True)
    except Exception as e:  # noqa: BLE001
        w4dev = None
        print(f"int4 HBM array: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    def dot(dims, ca=None, cb=None):
        def fn(a, bb):
            if ca is not None:
                a = a.astype(ca)
            if cb is not None:
                bb = bb.astype(cb)
            return jax.lax.dot_general(a, bb, (dims, ((), ())),
                                       preferred_element_type=jnp.int32)
        return fn

    d10 = ((1,), (0,))
    d00 = ((0,), (0,))
    d11 = ((1,), (1,))

    # --- W1 forward (B,N)x(N,H) -------------------------------------------
    scan_time("w1-i8", dot(d10), (x8, w8), iters, b)
    scan_time("w1-i4cast", dot(d10, jnp.int4, jnp.int4), (x4, w4), iters, b)
    if w4dev is not None:
        w1_4 = jax.jit(lambda w: w.astype(jnp.int4))(w4)
        scan_time("w1-i4stored-w", dot(d10, jnp.int4, None), (x4, w1_4),
                  iters, b)
    scan_time("w1-i8xi4", dot(d10, None, jnp.int4), (x8, w4), iters, b)
    # bf16 context
    xb = x8.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)

    def dotbf(a, bb):
        return jax.lax.dot_general(a, bb, (d10, ((), ())),
                                   preferred_element_type=jnp.float32)

    scan_time("w1-bf16", dotbf, (xb, wb), iters, b)

    # --- W2 forward (B,H)x(H,H) -------------------------------------------
    scan_time("w2-i8", dot(d10), (h8, v8), iters, b)
    scan_time("w2-i4cast", dot(d10, jnp.int4, jnp.int4), (h4, v4), iters, b)

    # --- dW1 (0,0): (B,N)^T x (B,H) — Mosaic-illegal for int4 --------------
    scan_time("dw1-i8(0,0)", dot(d00), (x8, h8), iters, b)
    scan_time("dw1-i4(0,0)", dot(d00, jnp.int4, jnp.int4), (x4, h4),
              iters, b)

    # --- dx (1,1): (B,H) x (H,H)^T ----------------------------------------
    scan_time("dx-i8(1,1)", dot(d11), (h8, v8), iters, b)
    scan_time("dx-i4(1,1)", dot(d11, jnp.int4, jnp.int4), (h4, v4),
              iters, b)


if __name__ == "__main__":
    main()
