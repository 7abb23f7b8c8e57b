#!/usr/bin/env python
"""Probe: does Mosaic lower int4 dot_general on this TPU, and at what rate?

v5e advertises int4 MXU throughput at 2x int8 (788 vs 394 TOPS).  If a
(Pt,H)x(H,H) int4 matmul inside a Pallas kernel runs ~2x the int8 rate, the
fused loss kernel's dw1/da0 gradient GEMMs (24 of its 36 ms MXU floor) are
candidates for int4 quantisation.

Usage: python tools/probe_int4.py [pt=2048] [iters=30]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, HW, H = 2048, 4096, 500


def scan_time(name, fn, args, iters):
    def body(carry, _):
        out = fn(carry, *args[1:])
        leaf = jax.tree_util.tree_leaves(out)[0]
        bump = (leaf.ravel()[0] * 0).astype(args[0].dtype)
        return args[0] + bump, ()

    run = jax.jit(lambda a0: jax.lax.scan(body, a0, None, length=iters)[0])
    try:
        r = run(args[0])
        r.block_until_ready()
    except Exception as e:  # noqa: BLE001 — probe tool, report and move on
        print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None
    t0 = time.perf_counter()
    r = run(args[0])
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:14s} {dt * 1e3:7.2f} ms/iter ({B / dt:9.0f} img-equiv/s)",
          flush=True)
    return dt


def main():
    pt = 2048
    iters = 30
    for a in sys.argv[1:]:
        k, v = a.split("=")
        if k == "pt":
            pt = int(v)
        elif k == "iters":
            iters = int(v)

    from spatialvae_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    a8 = jnp.clip(jnp.round(
        jax.random.normal(ks[0], (pt, H)) * 60), -127, 127).astype(jnp.int8)
    w8 = jnp.clip(jnp.round(
        jax.random.normal(ks[1], (H, H)) * 60), -127, 127).astype(jnp.int8)
    # int4 HBM arrays are not creatable through this runtime (UNIMPLEMENTED)
    # — probe in-kernel int8->int4 casts instead, which is what the fused
    # kernel would do anyway (gradients are quantised inside the kernel)
    a4in8 = jnp.clip(jnp.round(
        jax.random.normal(ks[2], (pt, H)) * 3), -7, 7).astype(jnp.int8)
    w4in8 = jnp.clip(jnp.round(
        jax.random.normal(ks[3], (H, H)) * 3), -7, 7).astype(jnp.int8)

    grid = (B, HW // pt)
    print(f"# grid={grid} pt={pt} H={H} iters={iters} "
          f"backend={jax.default_backend()}")
    vm = pltpu.VMEM

    def make(cast_to=None):
        def kern(a_ref, w_ref, out_ref):
            a = a_ref[:, :]
            w = w_ref[:, :]
            if cast_to is not None:
                a = a.astype(cast_to)
                w = w.astype(cast_to)
            acc = jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out_ref[:, :] = acc[0:8, :].astype(jnp.float32)

        def fn(a, w):
            return pl.pallas_call(
                kern, grid=grid,
                in_specs=[pl.BlockSpec((pt, H), lambda i, j: (0, 0),
                                       memory_space=vm),
                          pl.BlockSpec((H, H), lambda i, j: (0, 0),
                                       memory_space=vm)],
                out_specs=pl.BlockSpec((8, H), lambda i, j: (0, 0),
                                       memory_space=vm),
                out_shape=jax.ShapeDtypeStruct((8, H), jnp.float32),
            )(a, w)

        return fn

    scan_time("gemm-int8", make(), (a8, w8), iters)
    scan_time("gemm-int4", make(jnp.int4), (a4in8, w4in8), iters)
    scan_time("gemm-i4w", make(None), (a4in8, w4in8), iters)

    # ---- transposed-layout (feature-major) candidates ---------------------
    # aT/gT: (H, Pt) activation/gradient tiles; w: (H, H).
    # dw1  = dot(aT, gT, (1,1))   -> (H, H)   [today's (0,0), int4-illegal]
    # da0T = dot(w,  gT, (1,0))   -> (H, Pt)
    # fwdT = dot(wT, aT, (1,0))   -> (H, Pt)
    aT4 = jnp.clip(jnp.round(
        jax.random.normal(ks[0], (H, pt)) * 3), -7, 7).astype(jnp.int8)
    gT4 = jnp.clip(jnp.round(
        jax.random.normal(ks[1], (H, pt)) * 3), -7, 7).astype(jnp.int8)
    aT8 = jnp.clip(jnp.round(
        jax.random.normal(ks[2], (H, pt)) * 60), -127, 127).astype(jnp.int8)

    def maket(dims, out_shape, cast_to=None):
        def kern(a_ref, b_ref, out_ref):
            a = a_ref[:, :]
            bb = b_ref[:, :]
            if cast_to is not None:
                a = a.astype(cast_to)
                bb = bb.astype(cast_to)
            acc = jax.lax.dot_general(
                a, bb, (dims, ((), ())),
                preferred_element_type=jnp.int32)
            out_ref[:, :] = acc[0:8, :out_shape[1]].astype(jnp.float32)

        def fn(a, bb):
            sa, sb = a.shape, bb.shape
            return pl.pallas_call(
                kern, grid=grid,
                in_specs=[pl.BlockSpec(sa, lambda i, j: (0, 0),
                                       memory_space=vm),
                          pl.BlockSpec(sb, lambda i, j: (0, 0),
                                       memory_space=vm)],
                out_specs=pl.BlockSpec((8, out_shape[1]),
                                       lambda i, j: (0, 0),
                                       memory_space=vm),
                out_shape=jax.ShapeDtypeStruct((8, out_shape[1]),
                                               jnp.float32),
            )(a, bb)

        return fn

    scan_time("dw1T-i4(1,1)", maket(((1,), (1,)), (H, H), jnp.int4),
              (aT4, gT4), iters)
    scan_time("da0T-i4(1,0)", maket(((1,), (0,)), (H, pt), jnp.int4),
              (w4in8, gT4), iters)
    scan_time("fwdT-i8(1,0)", maket(((1,), (0,)), (H, pt)),
              (w8, aT8), iters)
    scan_time("fwdT-i4(1,0)", maket(((1,), (0,)), (H, pt), jnp.int4),
              (w4in8, aT4), iters)

    # ---- transposed first-layer build: (H,1) x (1,Pt) broadcasts ----------
    def buildT_kernel(xT_ref, fT_ref, out_ref):
        x0 = xT_ref[0:1, :]                        # (1, Pt)
        x1 = xT_ref[1:2, :]
        h0 = (fT_ref[0, :, 0:1] * x0 + fT_ref[0, :, 1:2] * x1
              + fT_ref[0, :, 2:3])                 # (H, Pt)
        a0 = jnp.tanh(h0)
        aq = jnp.round(a0 * 127.0).astype(jnp.int8)
        out_ref[:, :] = jnp.sum(aq.astype(jnp.int32), axis=0,
                                keepdims=True)     # consume fully (no DCE)

    xT = jax.random.normal(ks[3], (4, HW), jnp.float32)
    foldT = jax.random.normal(ks[0], (B, H, 4), jnp.float32)

    def buildT(xt, ft):
        return pl.pallas_call(
            buildT_kernel, grid=grid,
            in_specs=[pl.BlockSpec((4, pt), lambda i, j: (0, j),
                                   memory_space=vm),
                      pl.BlockSpec((1, H, 4), lambda i, j: (i, 0, 0),
                                   memory_space=vm)],
            out_specs=pl.BlockSpec((1, pt), lambda i, j: (0, 0),
                                   memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((1, pt), jnp.int32),
        )(xt, ft)

    scan_time("buildT-vpu", buildT, (xT, foldT), iters)

    # int4 RHS only (weights narrow, activations int8)
    def kern_wi4(a_ref, w_ref, out_ref):
        acc = jax.lax.dot_general(
            a_ref[:, :], w_ref[:, :].astype(jnp.int4),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out_ref[:, :] = acc[0:8, :].astype(jnp.float32)

    def gemm_wi4(a, w):
        return pl.pallas_call(
            kern_wi4, grid=grid,
            in_specs=[pl.BlockSpec((pt, H), lambda i, j: (0, 0),
                                   memory_space=vm),
                      pl.BlockSpec((H, H), lambda i, j: (0, 0),
                                   memory_space=vm)],
            out_specs=pl.BlockSpec((8, H), lambda i, j: (0, 0),
                                   memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((8, H), jnp.float32),
        )(a, w)

    scan_time("gemm-i8xi4", gemm_wi4, (a8, w4in8), iters)

    # ---- in-kernel transpose + int4 (1,0) dw1 -----------------------------
    # dw1 = transpose(aq) @ dh1q is a (1,0) contraction — int4-LEGAL — and
    # in i4fwd mode both operands are already 4-bit-valued, so if ONE int8
    # (Pt,H)->(H,Pt) transpose per tile is cheap, the 12.5 ms int8 dw1
    # falls to the ~7 ms int4 rate with zero quality change.  The round-2
    # 'i4all' failure was feature-major VALUES feeding elementwise chains;
    # here only the MXU operand is transposed.
    aT4p = jnp.clip(jnp.round(
        jax.random.normal(ks[2], (H, pt)) * 3), -7, 7).astype(jnp.int8)

    def make_tdw1(tr, cast_to):
        def kern(a_ref, g_ref, out_ref):
            a = a_ref[:, :]
            g = g_ref[:, :]
            aT = jnp.swapaxes(a, 0, 1) if tr else a
            if cast_to is not None:
                aT = aT.astype(cast_to)
                g = g.astype(cast_to)
            acc = jax.lax.dot_general(
                aT, g, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out_ref[:, :] = acc[0:8, :].astype(jnp.float32)

        def fn(a, g):
            return pl.pallas_call(
                kern, grid=grid,
                in_specs=[pl.BlockSpec(a.shape, lambda i, j: (0, 0),
                                       memory_space=vm),
                          pl.BlockSpec((pt, H), lambda i, j: (0, 0),
                                       memory_space=vm)],
                out_specs=pl.BlockSpec((8, H), lambda i, j: (0, 0),
                                       memory_space=vm),
                out_shape=jax.ShapeDtypeStruct((8, H), jnp.float32),
            )(a, g)

        return fn

    # pure (H,Pt)x(Pt,H) (1,0) GEMM rate from a pre-transposed operand
    scan_time("tdw1-pre-i4", make_tdw1(False, jnp.int4), (aT4p, a4in8),
              iters)
    scan_time("tdw1-pre-i8", make_tdw1(False, None), (aT8, a8), iters)
    # with the in-kernel transpose (the real deployment shape)
    scan_time("tdw1-tr-i4", make_tdw1(True, jnp.int4), (a4in8, a4in8),
              iters)
    scan_time("tdw1-tr-i8", make_tdw1(True, None), (a8, a8), iters)

    # transpose alone (consumed by a row-sum so it cannot be DCE'd)
    def kern_tr(a_ref, out_ref):
        aT = jnp.swapaxes(a_ref[:, :], 0, 1)
        out_ref[:, :] = jnp.sum(aT.astype(jnp.int32), axis=1,
                                keepdims=True).T

    def tr_only(a):
        return pl.pallas_call(
            kern_tr, grid=grid,
            in_specs=[pl.BlockSpec((pt, H), lambda i, j: (0, 0),
                                   memory_space=vm)],
            out_specs=pl.BlockSpec((1, H), lambda i, j: (0, 0),
                                   memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((1, H), jnp.int32),
        )(a)

    scan_time("tr-only-i8", tr_only, (a8,), iters)


if __name__ == "__main__":
    main()
