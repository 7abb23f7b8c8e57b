#!/usr/bin/env python
"""In-kernel microbenchmarks for the fused int8 decoder (TPU only).

Round-1 profile at B=2048 (galaxy 64px z=20): backward Pallas 41.4 ms,
forward 19.3 ms, everything else ~8 ms.  The int8 MXU floor is ~11 ms fwd /
~22 ms bwd, so ~27 ms of kernel time is VPU serialization, residual DMA, or
per-grid-step overhead.  This tool measures each component in isolation with
scan-amortized timing (single-dispatch timing is meaningless through the
axon tunnel):

  gemm1         one int8 (Pt,H)x(H,H) GEMM per step, tiny output  -> MXU floor
  gemm2         two GEMMs per step (the backward's dw1+da0 shapes)
  gemm1+vpu     GEMM plus the forward's serial VPU chain (a0 build/quant/tanh)
  fwd-nores     full forward kernel without the a1 residual write
  fwd           the shipping forward kernel
  bwd           the shipping backward kernel
  bwd-fixscale  backward with the per-tile max(|dh1|) replaced by a constant

Usage: python tools/kernel_bench.py [pt=2048] [iters=30]
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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, HW, H, NO = 2048, 4096, 500, 3   # B overridable via b=


def scan_time(name, fn, args, iters):
    """Wall time per iteration of fn(*args) inside one jitted lax.scan."""
    def body(carry, _):
        out = fn(carry, *args[1:])
        # thread a scalar of the output back into the carry so iterations
        # can't be CSE'd or folded
        leaf = jax.tree_util.tree_leaves(out)[0]
        bump = (leaf.ravel()[0] * 0).astype(args[0].dtype)
        return args[0] + bump, ()

    run = jax.jit(lambda a0: jax.lax.scan(body, a0, None, length=iters)[0])
    r = run(args[0])
    r.block_until_ready()                      # compile + warm
    t0 = time.perf_counter()
    r = run(args[0])
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:14s} {dt * 1e3:7.2f} ms/iter "
          f"({B / dt:9.0f} img-equiv/s)", flush=True)
    return dt


def main():
    global B, HW
    pt = 2048
    iters = 30
    only = None
    interpret = False
    for a in sys.argv[1:]:
        k, v = a.split("=")
        if k == "pt":
            pt = int(v)
        elif k == "iters":
            iters = int(v)
        elif k == "b":
            B = int(v)
        elif k == "hw":
            HW = int(v)
        elif k == "only":
            only = v.split(",")
        elif k == "interpret":
            # smoke-test mode (tests/test_kernel_bench_smoke.py): run the
            # probes through the Mosaic interpreter at tiny shapes so the
            # measurement harness the round-2/3 conclusions rest on stays
            # executable without a TPU.  Timings are meaningless here.
            interpret = v == "1"

    if interpret:
        # the axon plugin ignores the JAX_PLATFORMS env var; the config
        # flag wins (same dance as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
        from jax.experimental.pallas import tpu as _pltpu

        ctx = _pltpu.force_tpu_interpret_mode()
        ctx.__enter__()

    def want(name):
        return only is None or any(name.startswith(o) for o in only)

    from spatialvae_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    fold = jax.random.normal(ks[0], (B, 4, H), jnp.float32)
    coords = jax.random.normal(ks[1], (HW, 2), jnp.float32)
    w1 = jax.random.normal(ks[2], (H, H), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[3], (H,), jnp.float32) * 0.1
    wht = jax.random.normal(ks[4], (NO, H), jnp.float32) * 0.1
    bht = jax.random.normal(ks[5], (NO,), jnp.float32) * 0.1
    g = jax.random.normal(ks[6], (B, NO, HW), jnp.float32)

    from spatialvae_tpu.kernels.fused_decoder_int8 import (
        _bwd_pallas,
        _fwd_pallas,
        _quant_sym,
    )

    w1q, sw = _quant_sym(w1)
    a0q_tile = jnp.clip(jnp.round(
        jax.random.normal(ks[7], (pt, H)) * 60), -127, 127).astype(jnp.int8)

    grid = (B, HW // pt)
    n_steps = grid[0] * grid[1]
    print(f"# B={B} HW={HW} H={H} pt={pt} grid={grid} "
          f"({n_steps} steps/iter), iters={iters}")

    vm = pltpu.VMEM

    # ---- gemm1: pure int8 MXU + per-step overhead -------------------------
    def gemm1_kernel(aq_ref, wq_ref, out_ref):
        acc = jax.lax.dot_general(
            aq_ref[:, :], wq_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out_ref[:, :] = acc[0:8, :].astype(jnp.float32)

    def gemm1(aq, wq):
        return pl.pallas_call(
            gemm1_kernel, grid=grid,
            in_specs=[pl.BlockSpec((pt, H), lambda i, j: (0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((H, H), lambda i, j: (0, 0),
                                   memory_space=vm)],
            out_specs=pl.BlockSpec((8, H), lambda i, j: (0, 0),
                                   memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((8, H), jnp.float32),
        )(aq, wq)

    if want("gemm1") and not want("gemm1+"):
        scan_time("gemm1", gemm1, (a0q_tile, w1q), iters)

    # ---- gemm2: the backward's two GEMMs ----------------------------------
    def gemm2_kernel(aq_ref, gq_ref, wq_ref, out_ref):
        dw = jax.lax.dot_general(                  # (H, H) = aq^T gq
            aq_ref[:, :], gq_ref[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        da = jax.lax.dot_general(                  # (Pt, H) = gq W^T
            gq_ref[:, :], wq_ref[:, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        out_ref[:, :] = (dw[0:8, :] + da[0:8, :]).astype(jnp.float32)

    def gemm2(aq, gq, wq):
        return pl.pallas_call(
            gemm2_kernel, grid=grid,
            in_specs=[pl.BlockSpec((pt, H), lambda i, j: (0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((pt, H), lambda i, j: (0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((H, H), lambda i, j: (0, 0),
                                   memory_space=vm)],
            out_specs=pl.BlockSpec((8, H), lambda i, j: (0, 0),
                                   memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((8, H), jnp.float32),
        )(aq, gq, wq)

    if want("gemm2"):
        scan_time("gemm2", gemm2, (a0q_tile, a0q_tile, w1q), iters)

    # ---- gemm1 + the forward's serial VPU chain ---------------------------
    def gvpu_kernel(x_ref, f_ref, wq_ref, sw_ref, b1_ref, out_ref):
        x0 = x_ref[:, 0:1]
        x1 = x_ref[:, 1:2]
        h0 = x0 * f_ref[0, 0:1, :] + x1 * f_ref[0, 1:2, :] + f_ref[0, 2:3, :]
        a0 = jnp.tanh(h0)
        a0q = jnp.round(a0 * 127.0).astype(jnp.int8)
        acc = jax.lax.dot_general(
            a0q, wq_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        h1 = acc.astype(jnp.float32) * (sw_ref[0, 0] / 127.0) + b1_ref[0:1, :]
        a1 = jnp.tanh(h1)
        out_ref[:, :] = a1[0:8, :]

    def gvpu(x, f, wq, sw_, b1_):
        return pl.pallas_call(
            gvpu_kernel, grid=grid,
            in_specs=[pl.BlockSpec((pt, 2), lambda i, j: (j, 0),
                                   memory_space=vm),
                      pl.BlockSpec((1, 4, H), lambda i, j: (i, 0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((H, H), lambda i, j: (0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, H), lambda i, j: (0, 0),
                                   memory_space=vm)],
            out_specs=pl.BlockSpec((8, H), lambda i, j: (0, 0),
                                   memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((8, H), jnp.float32),
        )(x, f, wq, sw_, b1_)

    if want("gemm1+vpu"):
        scan_time("gemm1+vpu", gvpu, (coords, fold, w1q, sw, b1[None, :]), iters)

    # ---- the forward's VPU chain alone (no GEMM) ---------------------------
    def vpuonly_kernel(x_ref, f_ref, sw_ref, b1_ref, out_ref):
        x0 = x_ref[:, 0:1]
        x1 = x_ref[:, 1:2]
        h0 = x0 * f_ref[0, 0:1, :] + x1 * f_ref[0, 1:2, :] + f_ref[0, 2:3, :]
        a0 = jnp.tanh(h0)
        a0q = jnp.round(a0 * 127.0).astype(jnp.int8)
        out_ref[:, :] = a0q[0:32, :]

    def vpuonly(x, f, sw_, b1_):
        return pl.pallas_call(
            vpuonly_kernel, grid=grid,
            in_specs=[pl.BlockSpec((pt, 2), lambda i, j: (j, 0),
                                   memory_space=vm),
                      pl.BlockSpec((1, 4, H), lambda i, j: (i, 0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, H), lambda i, j: (0, 0),
                                   memory_space=vm)],
            out_specs=pl.BlockSpec((32, H), lambda i, j: (0, 0),
                                   memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((32, H), jnp.int8),
        )(x, f, sw_, b1_)

    if want("vpu-only"):
        scan_time("vpu-only", vpuonly, (coords, fold, sw, b1[None, :]),
                  iters)

    # ---- GEMM + INDEPENDENT VPU chain: does the hardware overlap them? ----
    def givpu_kernel(x_ref, f_ref, aq_ref, wq_ref, out_ref, out2_ref):
        acc = jax.lax.dot_general(                 # MXU on a constant tile
            aq_ref[:, :], wq_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        x0 = x_ref[:, 0:1]                          # VPU chain, independent
        x1 = x_ref[:, 1:2]
        h0 = x0 * f_ref[0, 0:1, :] + x1 * f_ref[0, 1:2, :] + f_ref[0, 2:3, :]
        a0 = jnp.tanh(h0)
        a0q = jnp.round(a0 * 127.0).astype(jnp.int8)
        out_ref[:, :] = acc[0:8, :].astype(jnp.float32)
        out2_ref[:, :] = a0q[0:32, :]

    def givpu(x, f, aq, wq):
        return pl.pallas_call(
            givpu_kernel, grid=grid,
            in_specs=[pl.BlockSpec((pt, 2), lambda i, j: (j, 0),
                                   memory_space=vm),
                      pl.BlockSpec((1, 4, H), lambda i, j: (i, 0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((pt, H), lambda i, j: (0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((H, H), lambda i, j: (0, 0),
                                   memory_space=vm)],
            out_specs=(pl.BlockSpec((8, H), lambda i, j: (0, 0),
                                    memory_space=vm),
                       pl.BlockSpec((32, H), lambda i, j: (0, 0),
                                    memory_space=vm)),
            out_shape=(jax.ShapeDtypeStruct((8, H), jnp.float32),
                       jax.ShapeDtypeStruct((32, H), jnp.int8)),
        )(x, f, aq, wq)

    def givpu_fn(x, f):
        return givpu(x, f, a0q_tile, w1q)

    if want("gemm1+ivpu"):
        scan_time("gemm1+ivpu", givpu_fn, (coords, fold), iters)

    # ---- GEMM + independent VPU, FULL consumption (no DCE this time) ------
    def givpu2_kernel(x_ref, f_ref, aq_ref, wq_ref, out_ref, out2_ref):
        acc = jax.lax.dot_general(
            aq_ref[:, :], wq_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        x0 = x_ref[:, 0:1]
        x1 = x_ref[:, 1:2]
        h0 = x0 * f_ref[0, 0:1, :] + x1 * f_ref[0, 1:2, :] + f_ref[0, 2:3, :]
        a0 = jnp.tanh(h0)
        a0q = jnp.round(a0 * 127.0).astype(jnp.int8)
        out_ref[:, :] = acc[0:8, :].astype(jnp.float32)
        # full reduction forces the whole (Pt, H) chain to execute
        out2_ref[:, :] = jnp.sum(a0q.astype(jnp.int32), axis=0,
                                 keepdims=True)

    def givpu2(x, f):
        return pl.pallas_call(
            givpu2_kernel, grid=grid,
            in_specs=[pl.BlockSpec((pt, 2), lambda i, j: (j, 0),
                                   memory_space=vm),
                      pl.BlockSpec((1, 4, H), lambda i, j: (i, 0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((pt, H), lambda i, j: (0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((H, H), lambda i, j: (0, 0),
                                   memory_space=vm)],
            out_specs=(pl.BlockSpec((8, H), lambda i, j: (0, 0),
                                    memory_space=vm),
                       pl.BlockSpec((1, H), lambda i, j: (0, 0),
                                    memory_space=vm)),
            out_shape=(jax.ShapeDtypeStruct((8, H), jnp.float32),
                       jax.ShapeDtypeStruct((1, H), jnp.int32)),
        )(x, f, a0q_tile, w1q)

    def givpu2_fn(x, f):
        return givpu2(x, f)[0]

    if want("gemm1+ivpu2"):
        scan_time("gemm1+ivpu2", givpu2_fn, (coords, fold), iters)

    # ---- the same full VPU chain alone (reduction-consumed) ---------------
    def vpu2_kernel(x_ref, f_ref, out2_ref):
        x0 = x_ref[:, 0:1]
        x1 = x_ref[:, 1:2]
        h0 = x0 * f_ref[0, 0:1, :] + x1 * f_ref[0, 1:2, :] + f_ref[0, 2:3, :]
        a0 = jnp.tanh(h0)
        a0q = jnp.round(a0 * 127.0).astype(jnp.int8)
        out2_ref[:, :] = jnp.sum(a0q.astype(jnp.int32), axis=0,
                                 keepdims=True)

    def vpu2(x, f):
        return pl.pallas_call(
            vpu2_kernel, grid=grid,
            in_specs=[pl.BlockSpec((pt, 2), lambda i, j: (j, 0),
                                   memory_space=vm),
                      pl.BlockSpec((1, 4, H), lambda i, j: (i, 0, 0),
                                   memory_space=vm)],
            out_specs=pl.BlockSpec((1, H), lambda i, j: (0, 0),
                                   memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((1, H), jnp.int32),
        )(x, f)

    if want("vpu-full"):
        scan_time("vpu-full", vpu2, (coords, fold), iters)

    # ---- forward without the a1 residual write ----------------------------
    from spatialvae_tpu.kernels.fused_decoder_int8 import _fwd_kernel

    def fwd_nores_kernel(x_ref, f_ref, w1q_ref, sw_ref, b1_ref, wht_ref,
                         bht_ref, y_ref):
        x0 = x_ref[:, 0:1]
        x1 = x_ref[:, 1:2]
        h0 = (x0 * f_ref[0, 0:1, :] + x1 * f_ref[0, 1:2, :]
              + f_ref[0, 2:3, :])
        a0 = jnp.tanh(h0)
        a0q = jnp.round(a0 * 127.0).astype(jnp.int8)
        acc = jax.lax.dot_general(
            a0q, w1q_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        h1 = acc.astype(jnp.float32) * (sw_ref[0, 0] / 127.0) + b1_ref[0:1, :]
        a1 = jnp.tanh(h1)
        z2t = jax.lax.dot_general(
            wht_ref[:, :], a1.astype(wht_ref.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        y_ref[0] = jax.nn.sigmoid(z2t + bht_ref[:, 0:1])

    def fwd_nores(x, f, wq, sw_, b1_, wh, bh):
        return pl.pallas_call(
            fwd_nores_kernel, grid=grid,
            in_specs=[pl.BlockSpec((pt, 2), lambda i, j: (j, 0),
                                   memory_space=vm),
                      pl.BlockSpec((1, 4, H), lambda i, j: (i, 0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((H, H), lambda i, j: (0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, H), lambda i, j: (0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((NO, H), lambda i, j: (0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((NO, 1), lambda i, j: (0, 0),
                                   memory_space=vm)],
            out_specs=pl.BlockSpec((1, NO, pt), lambda i, j: (i, 0, j),
                                   memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((B, NO, HW), jnp.float32),
        )(x, f, wq, sw_, b1_, wh, bh)

    if want("fwd-nores"):
        scan_time("fwd-nores", fwd_nores,
                  (coords, fold, w1q, sw, b1[None, :], wht, bht[:, None]),
                  iters)

    # ---- the shipping forward/backward ------------------------------------
    def fwd_full(f, x):
        # round 5: the forward no longer emits an activation residual
        return _fwd_pallas(f, x, w1q, sw, b1[None, :], wht, bht[:, None])

    # ---- pipelined forward prototype: sub-tiles + double-buffered acc ----
    def make_fwdpipe(S):
        St = pt // S

        def fwdpipe_kernel(x_ref, f_ref, w1q_ref, sw_ref, b1_ref, wht_ref,
                           bht_ref, y_ref, a1_ref, aq0, aq1, acc0, acc1):
            w0 = f_ref[0, 0:1, :]
            w1f = f_ref[0, 1:2, :]
            c = f_ref[0, 2:3, :]
            scale = sw_ref[0, 0] * (1.0 / 127.0)

            def build(t, aq):
                x0 = x_ref[pl.ds(t * St, St), 0:1]
                x1 = x_ref[pl.ds(t * St, St), 1:2]
                a0 = jnp.tanh(x0 * w0 + x1 * w1f + c)
                aq[:, :] = jnp.round(a0 * 127.0).astype(jnp.int8)

            def gemm(aq, acc):
                acc[:, :] = jax.lax.dot_general(
                    aq[:, :], w1q_ref[:, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)

            def epilogue(t, acc):
                h1 = acc[:, :].astype(jnp.float32) * scale + b1_ref[0:1, :]
                a1 = jnp.tanh(h1)
                z2t = jax.lax.dot_general(
                    wht_ref[:, :], a1, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                y_ref[0, :, pl.ds(t * St, St)] = jax.nn.sigmoid(
                    z2t + bht_ref[:, 0:1])
                a1_ref[0, pl.ds(t * St, St), :] = a1.astype(a1_ref.dtype)

            aqs = [aq0, aq1]
            accs = [acc0, acc1]
            build(0, aqs[0])
            gemm(aqs[0], accs[0])
            for t in range(S):
                if t + 1 < S:
                    build(t + 1, aqs[(t + 1) % 2])
                    gemm(aqs[(t + 1) % 2], accs[(t + 1) % 2])
                epilogue(t, accs[t % 2])

        def fwdpipe(x, f, wq, sw_, b1_, wh, bh):
            return pl.pallas_call(
                fwdpipe_kernel, grid=grid,
                in_specs=[pl.BlockSpec((pt, 2), lambda i, j: (j, 0),
                                       memory_space=vm),
                          pl.BlockSpec((1, 4, H), lambda i, j: (i, 0, 0),
                                       memory_space=vm),
                          pl.BlockSpec((H, H), lambda i, j: (0, 0),
                                       memory_space=vm),
                          pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                       memory_space=pltpu.SMEM),
                          pl.BlockSpec((1, H), lambda i, j: (0, 0),
                                       memory_space=vm),
                          pl.BlockSpec((NO, H), lambda i, j: (0, 0),
                                       memory_space=vm),
                          pl.BlockSpec((NO, 1), lambda i, j: (0, 0),
                                       memory_space=vm)],
                out_specs=(
                    pl.BlockSpec((1, NO, pt), lambda i, j: (i, 0, j),
                                 memory_space=vm),
                    pl.BlockSpec((1, pt, H), lambda i, j: (i, j, 0),
                                 memory_space=vm),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((B, NO, HW), jnp.float32),
                    jax.ShapeDtypeStruct((B, HW, H), jnp.bfloat16),
                ),
                scratch_shapes=[
                    pltpu.VMEM((St, H), jnp.int8),
                    pltpu.VMEM((St, H), jnp.int8),
                    pltpu.VMEM((St, H), jnp.int32),
                    pltpu.VMEM((St, H), jnp.int32),
                ],
            )(x, f, wq, sw_, b1_, wh, bh)

        def fn(x, f):
            y, a1 = fwdpipe(x, f, w1q, sw, b1[None, :], wht, bht[:, None])
            return y

        return fn

    for S in (2, 4):
        if want(f"fwd-pipe{S}"):
            scan_time(f"fwd-pipe{S}", make_fwdpipe(S), (coords, fold),
                      iters)

    if want("fwd") and only is not None and "fwd" in only:
        scan_time("fwd", fwd_full, (fold, coords), iters)
    elif only is None:
        scan_time("fwd", fwd_full, (fold, coords), iters)

    # ---- gemm3: the fused kernel's MXU floor (h1 + dw1 + da0) -------------
    def gemm3_kernel(aq_ref, gq_ref, wq_ref, out_ref):
        h1 = jax.lax.dot_general(
            aq_ref[:, :], wq_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        dw = jax.lax.dot_general(
            aq_ref[:, :], gq_ref[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        da = jax.lax.dot_general(
            gq_ref[:, :], wq_ref[:, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        out_ref[:, :] = (h1[0:8, :] + dw[0:8, :] + da[0:8, :]
                         ).astype(jnp.float32)

    def gemm3(aq, gq, wq):
        return pl.pallas_call(
            gemm3_kernel, grid=grid,
            in_specs=[pl.BlockSpec((pt, H), lambda i, j: (0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((pt, H), lambda i, j: (0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((H, H), lambda i, j: (0, 0),
                                   memory_space=vm)],
            out_specs=pl.BlockSpec((8, H), lambda i, j: (0, 0),
                                   memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((8, H), jnp.float32),
        )(aq, gq, wq)

    if want("gemm3"):
        scan_time("gemm3", gemm3, (a0q_tile, a0q_tile, w1q), iters)

    # ---- fused loss+grad content, NO cross-step pipeline (2-D grid) -------
    if want("fused-plain"):
        from spatialvae_tpu.kernels.fused_loss_int8 import _quant_sym

        y_tp = jax.random.uniform(ks[7], (B, NO, HW), jnp.float32)
        x3p = jnp.concatenate(
            [coords, jnp.ones((HW, 1), jnp.float32),
             jnp.zeros((HW, 1), jnp.float32)], axis=1).astype(jnp.bfloat16)

        def fplain_kernel(x_ref, x3_ref, f_ref, wq_ref, sw_ref, b1_ref,
                          wht_ref, bht_ref, yt_ref, df_ref, dw1_ref,
                          db1_ref, dwht_ref, dbht_ref):
            i = pl.program_id(0)
            j = pl.program_id(1)
            x0 = x_ref[:, 0:1]
            x1 = x_ref[:, 1:2]
            h0 = (x0 * f_ref[0, 0:1, :] + x1 * f_ref[0, 1:2, :]
                  + f_ref[0, 2:3, :])
            a0 = jnp.tanh(h0)
            aq = jnp.round(a0 * 127.0).astype(jnp.int8)
            scale = sw_ref[0, 0] * (1.0 / 127.0)
            acc = jax.lax.dot_general(
                aq, wq_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            h1 = acc.astype(jnp.float32) * scale + b1_ref[0:1, :]
            a1 = jnp.tanh(h1)
            a1c = a1.astype(jnp.bfloat16)
            z2 = jax.lax.dot_general(
                wht_ref[:, :], a1c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            sig = jax.nn.sigmoid(z2 + bht_ref[:, 0:1])
            yt = yt_ref[0]
            log_s = jnp.maximum(jnp.log(sig), -100.0)
            log_1ms = jnp.maximum(jnp.log1p(-sig), -100.0)
            bce = -jnp.sum(yt * log_s + (1.0 - yt) * log_1ms)
            dz2 = jnp.where(sig * (1.0 - sig) == 0.0, 0.0, sig - yt)
            dz2c = dz2.astype(jnp.bfloat16)
            dwht = jax.lax.dot_general(
                dz2c, a1c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dbht = jnp.sum(dz2, axis=1, keepdims=True)
            da1 = jax.lax.dot_general(
                dz2c, wht_ref[:, :], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dh1 = da1 * (1.0 - a1 * a1)
            db1 = jnp.sum(dh1, axis=0, keepdims=True)
            sg = jnp.max(jnp.abs(dh1)) * (1.0 / 127.0) + 1e-30
            dh1q = jnp.clip(jnp.round(dh1 * (1.0 / sg)), -127, 127
                            ).astype(jnp.int8)
            dw1 = jax.lax.dot_general(
                aq, dh1q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (sg * (1.0 / 127.0))
            da0 = jax.lax.dot_general(
                dh1q, wq_ref[:, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (sg * sw_ref[0, 0])
            dh0 = (da0 * (1.0 - a0 * a0)).astype(jnp.bfloat16)
            dfold = jax.lax.dot_general(
                x3_ref[:, :], dh0, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            row = jax.lax.broadcasted_iota(jnp.int32, dfold.shape, 0)
            col = jax.lax.broadcasted_iota(jnp.int32, dfold.shape, 1)
            dfold = dfold + jnp.where((row == 3) & (col == 0), bce, 0.0)
            first = jnp.logical_and(i == 0, j == 0)

            @pl.when(j == 0)
            def _():
                df_ref[0] = dfold

            @pl.when(j != 0)
            def _():
                df_ref[0] += dfold

            @pl.when(first)
            def _():
                dw1_ref[:, :] = dw1
                db1_ref[:, :] = db1
                dwht_ref[:, :] = dwht
                dbht_ref[:, :] = dbht

            @pl.when(jnp.logical_not(first))
            def _():
                dw1_ref[:, :] += dw1
                db1_ref[:, :] += db1
                dwht_ref[:, :] += dwht
                dbht_ref[:, :] += dbht

        from spatialvae_tpu.kernels.fused_decoder_int8 import (
            _quant_sym as _qs)
        w1qp, swp = _qs(w1)

        def fplain(f, x):
            return pl.pallas_call(
                fplain_kernel, grid=grid,
                in_specs=[
                    pl.BlockSpec((pt, 2), lambda i, j: (j, 0),
                                 memory_space=vm),
                    pl.BlockSpec((pt, 4), lambda i, j: (j, 0),
                                 memory_space=vm),
                    pl.BlockSpec((1, 4, H), lambda i, j: (i, 0, 0),
                                 memory_space=vm),
                    pl.BlockSpec((H, H), lambda i, j: (0, 0),
                                 memory_space=vm),
                    pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, H), lambda i, j: (0, 0),
                                 memory_space=vm),
                    pl.BlockSpec((NO, H), lambda i, j: (0, 0),
                                 memory_space=vm),
                    pl.BlockSpec((NO, 1), lambda i, j: (0, 0),
                                 memory_space=vm),
                    pl.BlockSpec((1, NO, pt), lambda i, j: (i, 0, j),
                                 memory_space=vm),
                ],
                out_specs=(
                    pl.BlockSpec((1, 4, H), lambda i, j: (i, 0, 0),
                                 memory_space=vm),
                    pl.BlockSpec((H, H), lambda i, j: (0, 0),
                                 memory_space=vm),
                    pl.BlockSpec((1, H), lambda i, j: (0, 0),
                                 memory_space=vm),
                    pl.BlockSpec((NO, H), lambda i, j: (0, 0),
                                 memory_space=vm),
                    pl.BlockSpec((NO, 1), lambda i, j: (0, 0),
                                 memory_space=vm),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((B, 4, H), jnp.float32),
                    jax.ShapeDtypeStruct((H, H), jnp.float32),
                    jax.ShapeDtypeStruct((1, H), jnp.float32),
                    jax.ShapeDtypeStruct((NO, H), jnp.float32),
                    jax.ShapeDtypeStruct((NO, 1), jnp.float32),
                ),
            )(x, x3p, f, w1qp, swp, b1[None, :], wht.astype(jnp.bfloat16),
              bht[:, None], y_tp)

        def fplain_fn(f, x):
            return fplain(f, x)[0]

        scan_time("fused-plain", fplain_fn, (fold, coords), iters)

    # ---- fused loss+grad kernel (kernels/fused_loss_int8.py) -------------
    # honours SPATIALVAE_INT4_GRADS / SPATIALVAE_MXU_BUILD for A/B runs
    if want("fused-loss"):
        from spatialvae_tpu.kernels.fused_loss_int8 import _lossgrad_pallas

        y_t = jax.random.uniform(ks[7], (B, NO, HW), jnp.float32)

        def flg(f, x):
            outs = _lossgrad_pallas(f, x, w1, b1[None, :],
                                    wht, bht[:, None], y_t)
            return outs[1]

        scan_time("fused-loss", flg, (fold, coords), iters)

    # ---- transposed (feature-major) fused loss+grad kernel ----------------
    # honours SPATIALVAE_INT4_GRADS_T / SPATIALVAE_PIPE_IMGS
    if want("fused-t"):
        from spatialvae_tpu.kernels.fused_loss_int8_t import (
            _lossgrad_pallas_t,
        )

        y_tt = jax.random.uniform(ks[7], (B, NO, HW), jnp.float32)
        foldT = jnp.swapaxes(fold, 1, 2)[:, :, :4]          # (B, H, 4)

        def flt(f, x):
            outs = _lossgrad_pallas_t(f, x, w1, b1, wht, bht[:], y_tt)
            return outs[1]

        scan_time("fused-t", flt, (foldT, coords), iters)

    if not (want("bwd")):
        return
    y_ = _fwd_pallas(fold, coords, w1q, sw, b1[None, :], wht,
                     bht[:, None])
    y_ = jax.block_until_ready(y_)

    def bwd_full(f, x):
        # round 5: measure the recompute (capacity-path) backward — pass
        # a1=None so it rebuilds the hidden in-kernel
        outs = _bwd_pallas(f, x, w1q, sw, b1[None, :], wht, None, y_, g)
        return outs[0]

    if want("bwd") and not want("bwd-"):
        scan_time("bwd", bwd_full, (fold, coords), iters)

    # ---- backward with a fixed gradient scale (no per-tile max) -----------
    def bwdfix_kernel(x_ref, f_ref, w1q_ref, sw_ref, wht_ref, a1_ref, y_ref,
                      g_ref, df_ref, dw1_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        x0 = x_ref[:, 0:1]
        x1 = x_ref[:, 1:2]
        h0 = (x0 * f_ref[0, 0:1, :] + x1 * f_ref[0, 1:2, :]
              + f_ref[0, 2:3, :])
        a0 = jnp.tanh(h0)
        a0q = jnp.round(a0 * 127.0).astype(jnp.int8)
        a1 = a1_ref[0].astype(jnp.float32)
        s = y_ref[0]
        dz2t = g_ref[0] * s * (1.0 - s)
        dz2c = dz2t.astype(wht_ref.dtype)
        da1 = jax.lax.dot_general(
            dz2c, wht_ref[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh1 = da1 * (1.0 - a1 * a1)
        sg = 0.01                                 # fixed scale (timing only)
        dh1q = jnp.clip(jnp.round(dh1 * (1.0 / sg)), -127, 127
                        ).astype(jnp.int8)
        dw1 = jax.lax.dot_general(
            a0q, dh1q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        da0 = jax.lax.dot_general(
            dh1q, w1q_ref[:, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        dh0 = da0 * (1.0 - a0 * a0)
        dw0r = jnp.sum(x0 * dh0, axis=0, keepdims=True)
        dw1r = jnp.sum(x1 * dh0, axis=0, keepdims=True)
        dcr = jnp.sum(dh0, axis=0, keepdims=True)
        dfold = jnp.concatenate(
            [dw0r, dw1r, dcr, jnp.zeros_like(dcr)], axis=0)[None]
        first = jnp.logical_and(i == 0, j == 0)

        @pl.when(first)
        def _():
            dw1_ref[:, :] = dw1

        @pl.when(jnp.logical_not(first))
        def _():
            dw1_ref[:, :] += dw1

        @pl.when(j == 0)
        def _():
            df_ref[:, :, :] = dfold

        @pl.when(j != 0)
        def _():
            df_ref[:, :, :] += dfold

    def bwdfix(f, x):
        return pl.pallas_call(
            bwdfix_kernel, grid=grid,
            in_specs=[pl.BlockSpec((pt, 2), lambda i, j: (j, 0),
                                   memory_space=vm),
                      pl.BlockSpec((1, 4, H), lambda i, j: (i, 0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((H, H), lambda i, j: (0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((NO, H), lambda i, j: (0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((1, pt, H), lambda i, j: (i, j, 0),
                                   memory_space=vm),
                      pl.BlockSpec((1, NO, pt), lambda i, j: (i, 0, j),
                                   memory_space=vm),
                      pl.BlockSpec((1, NO, pt), lambda i, j: (i, 0, j),
                                   memory_space=vm)],
            out_specs=(
                pl.BlockSpec((1, 4, H), lambda i, j: (i, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((H, H), lambda i, j: (0, 0), memory_space=vm),
            ),
            out_shape=(jax.ShapeDtypeStruct((B, 4, H), jnp.float32),
                       jax.ShapeDtypeStruct((H, H), jnp.float32)),
        )(x, f, w1q, sw, wht, a1_, y_, g)

    def bwdfix_fn(f, x):
        return bwdfix(f, x)[0]

    if want("bwd-fixscale"):
        # the shipping backward recomputes a1 (round 5); this legacy probe
        # still reads a residual, so synthesize one at the old shape
        a1_ = jnp.tanh(jax.random.normal(ks[7], (B, HW, H))
                       ).astype(jnp.bfloat16)
        scan_time("bwd-fixscale", bwdfix_fn, (fold, coords), iters)


if __name__ == "__main__":
    main()
