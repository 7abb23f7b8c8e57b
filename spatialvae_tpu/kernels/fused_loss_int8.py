"""Fused int8 forward+BCE+backward decoder kernel (the round-2 hot path).

One pallas_call computes, per training step, everything the Bernoulli
spatial decoder contributes to loss and gradients:

    a0  = tanh(x0*w0[b] + x1*w1[b] + c[b])          (pose-folded first layer)
    h1  = (a0q @ W1q) * s_w/127 + b1                (int8 MXU)
    a1  = tanh(h1)
    s   = sigmoid(Wh a1 + bh)                        (head)
    bce = -sum(y log s + (1-y) log(1-s))             (torch -100 clamp)
    dz2 = s - y                                      (BCE+sigmoid fused bwd)
    ... full backward to dfold/dW1/db1/dWh/dbh       (int8 MXU)

vs the round-1 split kernels this eliminates: the separate forward pass
over the batch, the 8.4 GB/step a1-residual HBM round-trip (a1 stays in
VMEM), the duplicated a0 rebuild, the XLA-side BCE + cotangent passes over
(B, n_out, HW), and the (B, n_out, HW) y materialisation.

Pipelining: microbenchmarks (tools/kernel_bench.py) show Mosaic overlaps
VPU work with the MXU only when it is *independent* of the in-flight
matmul (gemm1+ivpu == gemm1, but gemm1+vpu = gemm1 + 4.5 ms at B=2048).
The kernel therefore runs a 1-D grid of N+1 steps, software-pipelined one
step deep: step s builds a0q(s) and issues its h1 GEMM straight into a
rotating i32 VMEM scratch (no dependent VPU op after the matmul), then
runs the whole epilogue (head, BCE, backward) for step s-1 while the h1
GEMM for s occupies the MXU.  Output index maps are shifted by one step
accordingly; step N is a flush step that only runs the epilogue.

Numerics (speed mode — gated behind ElboConfig.int8 like the round-1
kernels): hidden GEMMs int8 with per-tensor weight / per-tile gradient
scales; a0 for the tanh' in dh0 is dequantised from a0q (<=0.8% rel);
dfold is computed on the MXU from a bf16 dh0 against bf16-rounded coords.
The bf16 fused kernel (fused_decoder.py) remains the parity path.
Long-horizon ELBO agreement is validated by tools/int8_horizon.py.

Supported family: foldable SpatialGenerator, num_layers=2, no resid, no
softplus, n_out<=8, bernoulli likelihood, no CTF/mask, HW % tile == 0
(galaxy flagship).  elbo.py falls back to the split kernels otherwise.
Reference math: /root/reference/spatial_vae/models.py:90-132 +
train_galaxy.py:27-128 (BCE x channels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spatialvae_tpu.core.config import SpatialGeneratorConfig
from spatialvae_tpu.kernels.fused_decoder_int8 import _quant_sym


def _pick_tile(hw: int) -> int:
    # i32 acc scratch x2 bounds the tile; 1024x512 keeps the whole kernel
    # (scratches + stage-B transients) ~13 MB of the 16 MB VMEM budget
    for t in (1024, 512, 256):
        if hw % t == 0:
            return t
    return hw


def can_fuse_loss_int8(cfg: SpatialGeneratorConfig, hw: int,
                       likelihood: str) -> bool:
    return (likelihood == "bernoulli"
            and not cfg.expand_coords and not cfg.bilinear and not cfg.resid
            and not cfg.softplus
            and cfg.num_layers == 2 and cfg.n_out <= 8
            and hw >= 1024 and hw % _pick_tile(hw) == 0)


def _kernel(x_ref, x3_ref, f_ref, w1q_ref, sw_ref, b1_ref, wht_ref, bht_ref,
            yt_ref, df_ref, dw1_ref, db1_ref, dwht_ref, dbht_ref,
            aq0, aq1, acc0, acc1, *, tiles: int):
    """1-D grid, N+1 steps (N = B * tiles); see module docstring.

    Stage A (s < N): build a0q(s), issue its h1 GEMM into scratch s%2.
    Stage B (s >= 1): full epilogue for step s-1 from scratch (s-1)%2.
    Block index maps: x/f at step s; x3/yt and all outputs at step s-1.
    """
    s = pl.program_id(0)
    n = pl.num_programs(0) - 1

    # ---- stage A: first layer + h1 GEMM for step s -------------------------
    @pl.when(s < n)
    def _build():
        x0 = x_ref[:, 0:1]
        x1 = x_ref[:, 1:2]
        w0 = f_ref[0, 0:1, :]
        w1f = f_ref[0, 1:2, :]
        c = f_ref[0, 2:3, :]
        a0 = jnp.tanh((x0 * w0 + x1 * w1f + c).astype(jnp.float32))
        aq = jnp.round(a0 * 127.0).astype(jnp.int8)

        # raw i32 matmul straight into the rotating scratch: nothing
        # downstream of the MXU in this stage, so the epilogue below can
        # run while it executes
        @pl.when(s % 2 == 0)
        def _():
            aq0[:, :] = aq
            acc0[:, :] = jax.lax.dot_general(
                aq, w1q_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        @pl.when(s % 2 == 1)
        def _():
            aq1[:, :] = aq
            acc1[:, :] = jax.lax.dot_general(
                aq, w1q_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

    # ---- stage B: head + BCE + backward for step s - 1 ----------------------
    @pl.when(s >= 1)
    def _epilogue():
        p = s - 1
        j = p % tiles                          # pixel-tile index of step p
        first = p == 0

        def run(aq_s, acc_s):
            scale = sw_ref[0, 0] * (1.0 / 127.0)
            h1 = acc_s[:, :].astype(jnp.float32) * scale + b1_ref[0:1, :]
            a1 = jnp.tanh(h1)                                   # (Pt, H)
            a1c = a1.astype(wht_ref.dtype)
            z2 = jax.lax.dot_general(                           # (No, Pt)
                wht_ref[:, :], a1c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            z2 = z2 + bht_ref[:, 0:1].astype(jnp.float32)
            sig = jax.nn.sigmoid(z2)

            yt = yt_ref[0].astype(jnp.float32)                  # (No, Pt)
            # torch BCE clamps each log term at -100 (train_mnist.py:81)
            log_s = jnp.maximum(jnp.log(sig), -100.0)
            log_1ms = jnp.maximum(jnp.log1p(-sig), -100.0)
            bce = -jnp.sum(yt * log_s + (1.0 - yt) * log_1ms)

            # d bce / d z2 = s - y, except 0 where sigmoid saturates
            # exactly (the clamp zeroes the gradient there — matches the
            # XLA clip path in f32)
            dz2 = jnp.where(sig * (1.0 - sig) == 0.0, 0.0, sig - yt)
            dz2c = dz2.astype(wht_ref.dtype)

            dwht = jax.lax.dot_general(                         # (No, H)
                dz2c, a1c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dbht = jnp.sum(dz2, axis=1, keepdims=True)          # (No, 1)
            da1 = jax.lax.dot_general(                          # (Pt, H)
                dz2c, wht_ref[:, :], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            dh1 = da1 * (1.0 - a1 * a1)
            db1 = jnp.sum(dh1, axis=0, keepdims=True)
            sg = jnp.max(jnp.abs(dh1)) * (1.0 / 127.0) + 1e-30
            dh1q = jnp.clip(jnp.round(dh1 * (1.0 / sg)), -127, 127
                            ).astype(jnp.int8)

            dw1 = jax.lax.dot_general(                          # (H, H) int8
                aq_s[:, :], dh1q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (sg * (1.0 / 127.0))
            da0 = jax.lax.dot_general(                          # (Pt, H) int8
                dh1q, w1q_ref[:, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (sg * sw_ref[0, 0])

            a0d = aq_s[:, :].astype(jnp.float32) * (1.0 / 127.0)
            dh0 = (da0 * (1.0 - a0d * a0d)).astype(jnp.bfloat16)
            # dfold rows [sum x0*dh0, sum x1*dh0, sum dh0, 0] as one MXU
            # contraction with the ones-augmented coords (Pt, 4)
            dfold = jax.lax.dot_general(                        # (4, H)
                x3_ref[:, :], dh0, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # stash the BCE partial in dfold[3, 0]: row 3 multiplies the
            # fold's zeros row, so its cotangent is discarded by autodiff
            # (Mosaic cannot store scalars to VMEM directly)
            row = jax.lax.broadcasted_iota(jnp.int32, dfold.shape, 0)
            col = jax.lax.broadcasted_iota(jnp.int32, dfold.shape, 1)
            stash = jnp.where((row == 3) & (col == 0), bce, 0.0)
            return dfold + stash, dw1, db1, dwht, dbht

        def stage(aq_s, acc_s):
            dfold, dw1, db1, dwht, dbht = run(aq_s, acc_s)

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

        @pl.when(p % 2 == 0)
        def _():
            stage(aq0, acc0)

        @pl.when(p % 2 == 1)
        def _():
            stage(aq1, acc1)


def _lossgrad_pallas(fold, coords, w1q, sw, b1, wht, bht, y_t,
                     interpret: bool = False):
    b, _, h = fold.shape
    hw = coords.shape[0]
    n_out = wht.shape[0]
    pt = _pick_tile(hw)
    tiles = hw // pt
    n_steps = b * tiles

    def i_of(s):                       # image index of step s (clamped)
        return jnp.minimum(s, n_steps - 1) // tiles

    def j_of(s):                       # pixel-tile index of step s (clamped)
        return jnp.minimum(s, n_steps - 1) % tiles

    def i_prev(s):                     # image index of step s - 1
        return jnp.maximum(s - 1, 0) // tiles

    def j_prev(s):
        return jnp.maximum(s - 1, 0) % tiles

    # ones-augmented coords for the dfold contraction, bf16 (speed mode)
    x3 = jnp.concatenate(
        [coords.astype(jnp.float32),
         jnp.ones((hw, 1), jnp.float32),
         jnp.zeros((hw, 1), jnp.float32)], axis=1).astype(jnp.bfloat16)

    vm = pltpu.VMEM
    out_shapes = (
        jax.ShapeDtypeStruct((b, 4, h), jnp.float32),   # dfold (+bce stash)
        jax.ShapeDtypeStruct((h, h), jnp.float32),      # dW1
        jax.ShapeDtypeStruct((1, h), jnp.float32),      # db1
        jax.ShapeDtypeStruct((n_out, h), jnp.float32),  # dWh^T
        jax.ShapeDtypeStruct((n_out, 1), jnp.float32),  # dbh
    )
    out_specs = (
        pl.BlockSpec((1, 4, h), lambda s: (i_prev(s), 0, 0),
                     memory_space=vm),
        pl.BlockSpec((h, h), lambda s: (0, 0), memory_space=vm),
        pl.BlockSpec((1, h), lambda s: (0, 0), memory_space=vm),
        pl.BlockSpec((n_out, h), lambda s: (0, 0), memory_space=vm),
        pl.BlockSpec((n_out, 1), lambda s: (0, 0), memory_space=vm),
    )
    return pl.pallas_call(
        functools.partial(_kernel, tiles=tiles),
        grid=(n_steps + 1,),
        in_specs=[
            pl.BlockSpec((pt, 2), lambda s: (j_of(s), 0), memory_space=vm),
            pl.BlockSpec((pt, 4), lambda s: (j_prev(s), 0),
                         memory_space=vm),
            pl.BlockSpec((1, 4, h), lambda s: (i_of(s), 0, 0),
                         memory_space=vm),
            pl.BlockSpec((h, h), lambda s: (0, 0), memory_space=vm),
            pl.BlockSpec((1, 1), lambda s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h), lambda s: (0, 0), memory_space=vm),
            pl.BlockSpec((n_out, h), lambda s: (0, 0), memory_space=vm),
            pl.BlockSpec((n_out, 1), lambda s: (0, 0), memory_space=vm),
            pl.BlockSpec((1, n_out, pt), lambda s: (i_prev(s), 0, j_prev(s)),
                         memory_space=vm),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((pt, h), jnp.int8),
            pltpu.VMEM((pt, h), jnp.int8),
            pltpu.VMEM((pt, h), jnp.int32),
            pltpu.VMEM((pt, h), jnp.int32),
        ],
        interpret=interpret,
    )(coords.astype(fold.dtype), x3, fold, w1q, sw, b1, wht, bht, y_t)


# ---------------------------------------------------------------------------
# custom-vjp op: scalar BCE out, gradients precomputed in the forward pass
# ---------------------------------------------------------------------------


def _run(fold, coords, w1, b1, wht, bht, y_t, interpret):
    w1q, sw = _quant_sym(w1)
    dfold, dw1, db1, dwht, dbht = _lossgrad_pallas(
        fold, coords, w1q, sw, b1[None, :].astype(jnp.float32),
        wht, bht[:, None], y_t, interpret=interpret)
    # the per-image BCE rides in dfold[:, 3, 0] (see _kernel); leaving it
    # in the gradient is harmless — row 3 multiplies the fold's zeros row
    return jnp.sum(dfold[:, 3, 0]), (dfold, dw1, db1, dwht, dbht)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_decoder_bce_int8(fold, coords, w1, b1, wht, bht, y_t,
                           interpret: bool = False):
    """Summed Bernoulli BCE of the int8 decoder over (B, HW, n_out) — with
    its gradients computed in the same kernel pass.

    fold: (B, 4, H) rows [w0, w1, c, 0]; coords: (HW, 2), HW tile-aligned;
    w1: (H, H); b1: (H,); wht: (n_out, H) pre-transposed head;
    bht: (n_out,); y_t: (B, n_out, HW) targets.

    The VJP scales the precomputed gradients by the scalar cotangent, so it
    is exact for any scalar downstream of the returned sum (the training
    loss uses bce/b).  y_t is treated as a constant (data).
    """
    bce, _ = _run(fold, coords, w1, b1, wht, bht, y_t, interpret)
    return bce


def _vjp_fwd(fold, coords, w1, b1, wht, bht, y_t, interpret):
    bce, grads = _run(fold, coords, w1, b1, wht, bht, y_t, interpret)
    # zero-size dtype sentinels keep the residual pytree array-only
    sentinels = (jnp.zeros((0,), fold.dtype), jnp.zeros((0,), w1.dtype),
                 jnp.zeros((0,), b1.dtype), jnp.zeros((0,), wht.dtype))
    return bce, (grads, sentinels)


def _vjp_bwd(interpret, res, g):
    (dfold, dw1, db1, dwht, dbht), (f_s, w_s, b_s, h_s) = res
    return ((g * dfold).astype(f_s.dtype), None, (g * dw1).astype(w_s.dtype),
            (g * db1[0]).astype(b_s.dtype), (g * dwht).astype(h_s.dtype),
            (g * dbht[:, 0]).astype(h_s.dtype), None)


fused_decoder_bce_int8.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# integration helper
# ---------------------------------------------------------------------------


def fused_bce_spatial_int8(params, cfg: SpatialGeneratorConfig,
                           coords, theta, dx, z, y,
                           interpret: bool = False):
    """BCE sum for the foldable int8 decoder against targets y.

    y: (B, HW) or (B, HW, C).  Pose fold stays in XLA so dtheta/ddx/dz and
    the coord/latent weight grads flow through its autodiff from dfold.
    Returns the summed BCE (scalar)."""
    from spatialvae_tpu.models.spatial import fold_pose_into_first_layer

    w0, w1f, c = fold_pose_into_first_layer(params, cfg, theta, dx, z)
    fold = jnp.stack([w0, w1f, c, jnp.zeros_like(c)], axis=1)
    hidden = params["layers"][0]
    head = params["layers"][1]
    b = y.shape[0]
    hw = coords.shape[0]
    y_t = y.reshape(b, hw, -1).swapaxes(1, 2).astype(jnp.float32)
    return fused_decoder_bce_int8(fold, coords, hidden["w"], hidden["b"],
                                  head["w"].T, head["b"], y_t, interpret)
