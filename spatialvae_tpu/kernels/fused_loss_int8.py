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
matmul AND in the same basic block (gemm1+ivpu == gemm1, but gemm1+vpu =
gemm1 + 4.5 ms at B=2048; a pl.when-staged cross-step pipeline was SLOWER
because the scheduler cannot interleave across scf.if region boundaries).
The kernel therefore processes an IMAGE PAIR per grid step in one straight-
line block — build(a), h1-GEMM(a), build(b), h1-GEMM(b), epilogue(a),
epilogue(b) — so each epilogue's VPU chain sits between independent MXU
work the scheduler is free to overlap it with.

Numerics (speed mode — gated behind ElboConfig.int8 like the round-1
kernels): hidden GEMMs int8 with per-tensor weight / per-tile gradient
scales; a0 for the tanh' in dh0 is dequantised from a0q (<=0.8% rel);
dfold is computed on the MXU from a bf16 dh0 against bf16-rounded coords.
The bf16 fused kernel (fused_decoder.py) remains the parity path.
Long-horizon ELBO agreement is validated by tools/int8_horizon.py.

Supported family: foldable SpatialGenerator, num_layers=2, no resid, no
softplus, n_out<=8, bernoulli likelihood, no CTF/mask, HW % tile == 0,
even batch (galaxy flagship).  elbo.py falls back to the split kernels otherwise.
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
    # pt=1024 measured marginally faster than 2048 (56.30 vs 56.95 ms at
    # B=2048) and keeps the working set lean
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


class _Phases:
    """Epilogue for one image of the pair, split into alternating VPU/MXU
    phases so two instances can be interleaved (see _kernel)."""

    def __init__(self, r, aq, acc, sw_ref, b1_ref, wht_ref, bht_ref, yt_ref,
                 w1q_ref, x3_ref):
        self.r = r
        self.aq = aq
        self.acc = acc
        self.sw_ref = sw_ref
        self.b1_ref = b1_ref
        self.wht_ref = wht_ref
        self.bht_ref = bht_ref
        self.yt_ref = yt_ref
        self.w1q_ref = w1q_ref
        self.x3_ref = x3_ref

    def p1_h1a1(self):                                       # VPU
        scale = self.sw_ref[0, 0] * (1.0 / 127.0)
        h1 = self.acc.astype(jnp.float32) * scale + self.b1_ref[0:1, :]
        self.a1c = jnp.tanh(h1).astype(self.wht_ref.dtype)   # (Pt, H)

    def p2_head(self):                                       # MXU
        z2 = jax.lax.dot_general(                            # (No, Pt)
            self.wht_ref[:, :], self.a1c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        self.z2 = z2 + self.bht_ref[:, 0:1].astype(jnp.float32)

    def p3_bce(self):                                        # VPU (tiny)
        sig = jax.nn.sigmoid(self.z2)
        yt = self.yt_ref[self.r].astype(jnp.float32)         # (No, Pt)
        # torch BCE clamps each log term at -100 (train_mnist.py:81)
        log_s = jnp.maximum(jnp.log(sig), -100.0)
        log_1ms = jnp.maximum(jnp.log1p(-sig), -100.0)
        self.bce = -jnp.sum(yt * log_s + (1.0 - yt) * log_1ms)
        # d bce / d z2 = s - y, except 0 where sigmoid saturates exactly
        dz2 = jnp.where(sig * (1.0 - sig) == 0.0, 0.0, sig - yt)
        self.dz2 = dz2
        self.dz2c = dz2.astype(self.wht_ref.dtype)

    def p4_headbwd(self):                                    # MXU
        self.dwht = jax.lax.dot_general(                     # (No, H)
            self.dz2c, self.a1c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # bf16 da1 halves the largest transient (Mosaic needs a 32-bit
        # matmul acc, so cast right after); dh1 is int8-quantised next, so
        # the 0.4% rounding is below the quant noise
        self.da1 = jax.lax.dot_general(                      # (Pt, H)
            self.dz2c, self.wht_ref[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def p5_dh1(self):                                        # VPU
        self.dbht = jnp.sum(self.dz2, axis=1, keepdims=True)
        one = jnp.bfloat16(1.0)
        dh1 = self.da1 * (one - self.a1c * self.a1c)         # (Pt, H) bf16
        self.db1 = jnp.sum(dh1, axis=0, keepdims=True,
                           dtype=jnp.float32)
        # quantise in bf16 (no f32 materialisation of the tile); the
        # dequant scale is the exact f32 inverse of the bf16 quant scale,
        # so no systematic gradient-scale error is introduced.  Scales stay
        # (1, 1) arrays — Mosaic cannot extract sub-32-bit scalars.
        # reduce rows in bf16 (cheap), then lanes in f32 — the all-axis
        # bf16 max lowers through a sub-32-bit scalar squeeze, rejected
        m1 = jnp.max(jnp.abs(dh1), axis=0, keepdims=True)   # (1, H) bf16
        maxv = jnp.max(m1.astype(jnp.float32), axis=1,
                       keepdims=True) + 1e-30               # (1, 1) f32
        qs_b = (127.0 / maxv).astype(jnp.bfloat16)          # (1, 1)
        self.sg = 1.0 / qs_b.astype(jnp.float32)            # (1, 1) f32
        # neither bf16 roundeven nor bf16 comparisons legalize in Mosaic:
        # round the scaled tile in f32 (one transient pass)
        q = (dh1 * qs_b).astype(jnp.float32)
        self.dh1q = jnp.clip(jnp.round(q), -127, 127).astype(jnp.int8)

    def p6_gemms(self):                                      # MXU
        self.dw1 = jax.lax.dot_general(                      # (H, H) int8
            self.aq, self.dh1q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32
        ).astype(jnp.float32) * (self.sg * (1.0 / 127.0))
        self.da0 = jax.lax.dot_general(                      # (Pt, H) int8
            self.dh1q, self.w1q_ref[:, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)

    def p7_dh0(self):                                        # VPU, bf16
        a0d = self.aq.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 127.0)
        scl = (self.sg * self.sw_ref[0, 0]).astype(jnp.bfloat16)
        da0 = self.da0.astype(jnp.bfloat16) * scl
        self.dh0 = da0 * (jnp.bfloat16(1.0) - a0d * a0d)

    def p8_dfold(self):                                      # MXU + tiny VPU
        # dfold rows [sum x0*dh0, sum x1*dh0, sum dh0, 0] as one MXU
        # contraction with the ones-augmented coords (Pt, 4)
        dfold = jax.lax.dot_general(                         # (4, H)
            self.x3_ref[:, :].astype(jnp.bfloat16), self.dh0,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # stash the BCE partial in dfold[3, 0]: row 3 multiplies the
        # fold's zeros row, so its cotangent is discarded by autodiff
        # (Mosaic cannot store scalars to VMEM directly)
        row = jax.lax.broadcasted_iota(jnp.int32, dfold.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, dfold.shape, 1)
        self.dfold = dfold + jnp.where((row == 3) & (col == 0),
                                       self.bce, 0.0)


def _kernel(x3_ref, f_ref, w1q_ref, sw_ref, b1_ref, wht_ref, bht_ref,
            yt_ref, df_ref, dw1_ref, db1_ref, dwht_ref, dbht_ref):
    """Grid (B//2, tiles): one IMAGE PAIR x one pixel tile per step.

    Straight-line body (no control flow until the accumulator writes) so
    the in-order machine can overlap each image's VPU chains with the
    other image's in-flight MXU work.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    x0 = x3_ref[:, 0:1].astype(jnp.float32)
    x1 = x3_ref[:, 1:2].astype(jnp.float32)

    def build(r):
        w0 = f_ref[r, 0:1, :]
        w1f = f_ref[r, 1:2, :]
        c = f_ref[r, 2:3, :]
        a0 = jnp.tanh((x0 * w0 + x1 * w1f + c).astype(jnp.float32))
        aq = jnp.round(a0 * 127.0).astype(jnp.int8)
        acc = jax.lax.dot_general(
            aq, w1q_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return aq, acc

    # -- explicit two-image software pipeline --------------------------------
    # The machine issues in order with an async MXU: a VPU op dependent on
    # the previous matmul stalls (~0.5 us bubble per boundary, measured),
    # but independent work placed there executes for free.  Image B's
    # phases run one phase BEHIND image A's, so every dependent wait of one
    # image is covered by the other's adjacent-phase work — and unlike the
    # lockstep ordering, no two same-phase transients (the 4 MB da1/da0
    # tiles) are ever live together.
    aq_a, acc_a = build(0)
    aq_b, acc_b = build(1)

    sa = _Phases(0, aq_a, acc_a, sw_ref, b1_ref, wht_ref, bht_ref, yt_ref,
                 w1q_ref, x3_ref)
    sb = _Phases(1, aq_b, acc_b, sw_ref, b1_ref, wht_ref, bht_ref, yt_ref,
                 w1q_ref, x3_ref)
    # measured-best schedule: image B one phase behind image A
    seq = ("p1_h1a1", "p2_head", "p3_bce", "p4_headbwd", "p5_dh1",
           "p6_gemms", "p7_dh0", "p8_dfold")
    getattr(sa, seq[0])()
    getattr(sa, seq[1])()
    getattr(sb, seq[0])()
    for k in range(2, len(seq)):
        getattr(sa, seq[k])()
        getattr(sb, seq[k - 1])()
    getattr(sb, seq[-1])()

    df_pair = jnp.stack([sa.dfold, sb.dfold])               # (2, 4, H)
    dw1 = sa.dw1 + sb.dw1
    db1 = sa.db1 + sb.db1
    dwht = sa.dwht + sb.dwht
    dbht = sa.dbht + sb.dbht

    first = jnp.logical_and(i == 0, j == 0)

    @pl.when(j == 0)
    def _():
        df_ref[:, :, :] = df_pair

    @pl.when(j != 0)
    def _():
        df_ref[:, :, :] += df_pair

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


def _lossgrad_pallas(fold, coords, w1q, sw, b1, wht, bht, y_t,
                     interpret: bool = False):
    b, _, h = fold.shape
    hw = coords.shape[0]
    n_out = wht.shape[0]
    pt = _pick_tile(hw)
    tiles = hw // pt
    assert b % 2 == 0, "fused loss kernel processes image pairs"

    # ones-augmented coords: columns 0-1 feed the first-layer build, the
    # full (Pt, 4) block is the dfold contraction LHS
    x3 = jnp.concatenate(
        [coords.astype(jnp.float32),
         jnp.ones((hw, 1), jnp.float32),
         jnp.zeros((hw, 1), jnp.float32)], axis=1)

    vm = pltpu.VMEM
    out_shapes = (
        jax.ShapeDtypeStruct((b, 4, h), jnp.float32),   # dfold (+bce stash)
        jax.ShapeDtypeStruct((h, h), jnp.float32),      # dW1
        jax.ShapeDtypeStruct((1, h), jnp.float32),      # db1
        jax.ShapeDtypeStruct((n_out, h), jnp.float32),  # dWh^T
        jax.ShapeDtypeStruct((n_out, 1), jnp.float32),  # dbh
    )
    out_specs = (
        pl.BlockSpec((2, 4, h), lambda i, j: (i, 0, 0), memory_space=vm),
        pl.BlockSpec((h, h), lambda i, j: (0, 0), memory_space=vm),
        pl.BlockSpec((1, h), lambda i, j: (0, 0), memory_space=vm),
        pl.BlockSpec((n_out, h), lambda i, j: (0, 0), memory_space=vm),
        pl.BlockSpec((n_out, 1), lambda i, j: (0, 0), memory_space=vm),
    )
    return pl.pallas_call(
        _kernel,
        grid=(b // 2, tiles),
        in_specs=[
            pl.BlockSpec((pt, 4), lambda i, j: (j, 0), memory_space=vm),
            pl.BlockSpec((2, 4, h), lambda i, j: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((h, h), lambda i, j: (0, 0), memory_space=vm),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h), lambda i, j: (0, 0), memory_space=vm),
            pl.BlockSpec((n_out, h), lambda i, j: (0, 0), memory_space=vm),
            pl.BlockSpec((n_out, 1), lambda i, j: (0, 0), memory_space=vm),
            pl.BlockSpec((2, n_out, pt), lambda i, j: (i, 0, j),
                         memory_space=vm),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        # the kernel's working set at pt=2048 is ~21 MB of the 128 MB
        # physical VMEM; the 16 MB default scoped limit is a compiler
        # heuristic, not the hardware
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
        interpret=interpret,
    )(x3, fold, w1q, sw, b1, wht, bht, y_t)


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
