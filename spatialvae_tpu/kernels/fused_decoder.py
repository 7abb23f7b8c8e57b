"""Fused Pallas decoder tail — the north-star kernel (BASELINE.json).

The spatial generator's hot path is, per (image b, pixel p):

    h0 = x0[p]*w0[b] + x1[p]*w1[b] + c[b]        # pose-folded first layer
    a0 = tanh(h0)
    h1 = a0 @ W1 + b1                            # (H,H) hidden GEMM
    a1 = tanh(h1)
    y  = sigmoid(a1 @ Wh + bh)                   # (H,n_out) head

where (w0, w1, c) already encode the reparameterised rotation, translation
and latent contribution (models/spatial.py fold).  Under plain XLA the
(B, HW, H) activations h0/a0/h1/a1 round-trip HBM between GEMMs — at galaxy
scale (B=256, HW=4096, H=512) that is ~0.5 GB per tensor per direction and
the step is part HBM-bound.  This kernel keeps every intermediate in VMEM:

- forward: grid (B, HW/Pt); each step builds h0 for a (Pt, H) tile with two
  lane-broadcast FMAs, runs the H x H GEMM on the MXU with f32 accumulation,
  and evaluates the tiny head (n_out <= 8) on the VPU as per-channel
  broadcast reductions — an (H, n_out) MXU matmul would pad n_out to 128
  lanes and waste ~25% of the main GEMM's time.  The output is laid out
  (B, n_out, HW) so the lane dimension is the pixel tile.
- backward (custom VJP): the same tiling, recomputing a0/a1 in VMEM
  (flash-attention-style rematerialisation) and accumulating dW1/db1/dWh/dbh
  into constant-index output blocks across the sequential TPU grid, plus the
  per-image (dw0, dw1, dc) fold gradients.  The head's backward is likewise
  VPU-only.

Gradients w.r.t. theta/dx/z/coord_linear/latent_linear then flow through the
fold's own (cheap) autodiff in XLA.

Supported shape family: the foldable SpatialGenerator with one hidden layer
(num_layers=2 — the default in every reference CLI), no resid, n_out <= 8.
Other configs use the XLA path (objectives/elbo.py chooses automatically).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spatialvae_tpu.core.config import SpatialGeneratorConfig


def can_fuse_decoder(cfg: SpatialGeneratorConfig, hw: int) -> bool:
    # non-aligned pixel counts are padded with dummy coordinates in
    # fused_spatial_generator; tiny images aren't worth a kernel launch
    return (not cfg.expand_coords and not cfg.bilinear and not cfg.resid
            and cfg.num_layers == 2 and cfg.n_out <= 8 and hw >= 256)


def _pick_tile(hw: int, max_tile: int = 1024) -> int:
    """Pixel-tile size bounded by VMEM: the forward keeps ~4 (Pt, H) f32
    buffers live, the backward ~8, against the 16 MB scoped-vmem limit."""
    for t in (2048, 1024, 512, 256):
        if t <= max_tile and hw % t == 0:
            return t
    return hw


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, f_ref, w1_ref, b1_ref, wht_ref, bht_ref,
                y_ref, a1_ref):
    """One (image, pixel-tile) grid step.

    x_ref: (Pt, 2) coords; f_ref: (1, 4, H) folded rows [w0, w1, c, 0];
    w1_ref: (H, H); b1_ref: (1, H); wht_ref: (No, H) pre-transposed head;
    bht_ref: (No, 1); y_ref: (1, No, Pt) output tile; a1_ref: (1, Pt, H)
    bf16 residual for the backward — saving a1 costs ~2 bytes/element of
    HBM traffic vs ~2H flops/element to recompute the H x H GEMM, and the
    MXU's arithmetic intensity makes the store much cheaper.
    """
    x0 = x_ref[:, 0:1]                         # (Pt, 1)
    x1 = x_ref[:, 1:2]
    w0 = f_ref[0, 0:1, :]                      # (1, H)
    w1f = f_ref[0, 1:2, :]
    c = f_ref[0, 2:3, :]

    h0 = x0 * w0 + x1 * w1f + c                # (Pt, H) lane-broadcast FMAs
    a0 = jnp.tanh(h0)
    h1 = jnp.dot(a0.astype(w1_ref.dtype), w1_ref[:, :],
                 preferred_element_type=jnp.float32) + b1_ref[0:1, :]
    a1 = jnp.tanh(h1)

    # head as a small-M MXU matmul: (No, H) x (Pt, H)^T -> (No, Pt).
    # M=n_out pads only to 8 sublanes (vs padding n_out to 128 lanes when
    # computed as (Pt,H)x(H,No)), and the (No, Pt) result writes straight
    # into the (1, No, Pt) output block.
    a1c = a1.astype(wht_ref.dtype)
    z2t = jax.lax.dot_general(
        wht_ref[:, :], a1c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    z2t = z2t + bht_ref[:, 0:1].astype(jnp.float32)
    y_ref[0] = jax.nn.sigmoid(z2t)
    # residual dtype follows the weights: bf16 in mixed-precision training
    # (cheap store), f32 in full-precision/parity mode (exact backward)
    a1_ref[0] = a1.astype(a1_ref.dtype)


def _fwd_pallas(fold, coords, w1, b1, wht, bht):
    b, _, h = fold.shape
    hw = coords.shape[0]
    n_out = wht.shape[0]
    pt = _pick_tile(hw, max_tile=1024)
    grid = (b, hw // pt)

    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((pt, 2), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_out, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_out, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n_out, pt), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pt, h), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_out, hw), jnp.float32),
            jax.ShapeDtypeStruct((b, hw, h), w1.dtype),
        ),
    )(coords, fold, w1, b1, wht, bht)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(x_ref, f_ref, w1_ref, wht_ref, a1_ref, y_ref, g_ref,
                df_ref, dw1_ref, db1_ref, dwht_ref, dbht_ref):
    """Backward for one tile using the saved residuals.

    a1_ref: (1, Pt, H) bf16 saved by the forward (skips the H x H recompute
    GEMM); y_ref: (1, No, Pt) the forward's own sigmoid output — it IS the
    head's backward residual, so nothing of the head is recomputed.  a0 is
    recomputed from the fold (VPU-only, cheap).

    g_ref: (1, No, Pt) cotangent of y.  Accumulators dw1/db1/dwht/dbht use a
    constant index map — the TPU grid runs sequentially, so += is safe.
    df_ref (1, 4, H) accumulates over the pixel-tile axis per image.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    x0 = x_ref[:, 0:1]
    x1 = x_ref[:, 1:2]
    w0r = f_ref[0, 0:1, :]
    w1r = f_ref[0, 1:2, :]
    cr = f_ref[0, 2:3, :]

    # recompute only the (VPU) first layer; a1 comes from the residual
    h0 = x0 * w0r + x1 * w1r + cr
    a0 = jnp.tanh(h0)
    a0c = a0.astype(w1_ref.dtype)
    a1c = a1_ref[0]                            # (Pt, H) bf16
    a1 = a1c.astype(jnp.float32)

    s = y_ref[0]                               # (No, Pt) = sigmoid(z2)
    dz2t = g_ref[0] * s * (1.0 - s)
    dz2c = dz2t.astype(wht_ref.dtype)

    # dWh^T (No, H) = dz2t (No, Pt) . a1 (Pt, H)
    dwht = jax.lax.dot_general(
        dz2c, a1c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbht = jnp.sum(dz2t, axis=1, keepdims=True)            # (No, 1)
    # da1 (Pt, H) = dz2t (No, Pt)^T . wht (No, H) — K = n_out, tiny
    da1 = jax.lax.dot_general(
        dz2c, wht_ref[:, :], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    dh1 = da1 * (1.0 - a1 * a1)                # tanh'
    dh1c = dh1.astype(w1_ref.dtype)
    # contracted via dimension numbers — no materialised transposes
    dw1 = jax.lax.dot_general(                 # a0^T . dh1 -> (H, H)
        a0c, dh1c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1 = jnp.sum(dh1, axis=0, keepdims=True)
    da0 = jax.lax.dot_general(                 # dh1 . W1^T -> (Pt, H)
        dh1c, w1_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    dh0 = da0 * (1.0 - a0 * a0)                # (Pt, H)
    dw0r = jnp.sum(x0 * dh0, axis=0, keepdims=True)    # (1, H)
    dw1r = jnp.sum(x1 * dh0, axis=0, keepdims=True)
    dcr = jnp.sum(dh0, axis=0, keepdims=True)
    dfold = jnp.concatenate([dw0r, dw1r, dcr,
                             jnp.zeros_like(dcr)], axis=0)[None]  # (1,4,H)

    first_step = jnp.logical_and(i == 0, j == 0)

    @pl.when(first_step)
    def _():
        dw1_ref[:, :] = dw1
        db1_ref[:, :] = db1
        dwht_ref[:, :] = dwht
        dbht_ref[:, :] = dbht

    @pl.when(jnp.logical_not(first_step))
    def _():
        dw1_ref[:, :] += dw1
        db1_ref[:, :] += db1
        dwht_ref[:, :] += dwht
        dbht_ref[:, :] += dbht

    @pl.when(j == 0)
    def _():
        df_ref[:, :, :] = dfold

    @pl.when(j != 0)
    def _():
        df_ref[:, :, :] += dfold


def _bwd_pallas(fold, coords, w1, wht, a1, y, g):
    b, _, h = fold.shape
    hw = coords.shape[0]
    n_out = wht.shape[0]
    pt = _pick_tile(hw, max_tile=1024)
    grid = (b, hw // pt)

    out_shapes = (
        jax.ShapeDtypeStruct((b, 4, h), jnp.float32),      # dfold
        jax.ShapeDtypeStruct((h, h), jnp.float32),         # dW1
        jax.ShapeDtypeStruct((1, h), jnp.float32),         # db1
        jax.ShapeDtypeStruct((n_out, h), jnp.float32),     # dWh^T
        jax.ShapeDtypeStruct((n_out, 1), jnp.float32),     # dbh^T
    )
    out_specs = (
        pl.BlockSpec((1, 4, h), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_out, h), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_out, 1), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((pt, 2), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_out, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pt, h), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_out, pt), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_out, pt), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
    )(coords, fold, w1, wht, a1, y, g)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@jax.custom_vjp
def fused_decoder_tail(fold: jnp.ndarray, coords: jnp.ndarray,
                       w1: jnp.ndarray, b1: jnp.ndarray,
                       wht: jnp.ndarray, bht: jnp.ndarray) -> jnp.ndarray:
    """fold: (B, 4, H) rows [w0, w1, c, unused]; coords: (HW, 2);
    w1: (H, H); b1: (H,); wht: (n_out, H) pre-transposed head weight;
    bht: (n_out,).  Returns sigmoid head output (B, n_out, HW) float32."""
    y, _ = _fwd_pallas(fold, coords, w1, b1[None, :], wht, bht[:, None])
    return y


def _vjp_fwd(fold, coords, w1, b1, wht, bht):
    y, a1 = _fwd_pallas(fold, coords, w1, b1[None, :], wht, bht[:, None])
    return y, (fold, coords, w1, b1, wht, bht, a1, y)


def _vjp_bwd(res, g):
    fold, coords, w1, b1, wht, bht, a1, y = res
    dfold, dw1, db1, dwht, dbht = _bwd_pallas(
        fold, coords, w1, wht, a1, y, g.astype(jnp.float32))
    return (dfold.astype(fold.dtype), None, dw1.astype(w1.dtype),
            db1[0].astype(b1.dtype), dwht.astype(wht.dtype),
            dbht[:, 0].astype(bht.dtype))


fused_decoder_tail.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# integration helper
# ---------------------------------------------------------------------------


def fused_spatial_generator(params, cfg: SpatialGeneratorConfig,
                            coords: jnp.ndarray, theta, dx, z) -> jnp.ndarray:
    """Drop-in replacement for spatial_generator_apply_folded using the
    fused kernel.  Pose fold + head transpose + optional softplus stay in
    XLA (cheap, and the fold's autodiff provides dtheta/ddx/dz/dcoord/
    dlatent)."""
    from spatialvae_tpu.models.spatial import fold_pose_into_first_layer

    w0, w1f, c = fold_pose_into_first_layer(params, cfg, theta, dx, z)
    zeros = jnp.zeros_like(c)
    fold = jnp.stack([w0, w1f, c, zeros], axis=1)      # (B, 4, H)
    hidden = params["layers"][0]
    head = params["layers"][1]
    hw = coords.shape[0]
    pad = (-hw) % 256                                  # tile-align pixels
    coords_p = coords.astype(jnp.float32)
    if pad:
        coords_p = jnp.concatenate(
            [coords_p, jnp.zeros((pad, 2), jnp.float32)], axis=0)
    yt = fused_decoder_tail(fold, coords_p,
                            hidden["w"], hidden["b"],
                            head["w"].T, head["b"])    # (B, No, HW+pad)
    y = jnp.swapaxes(yt[..., :hw], 1, 2)               # (B, HW, No)
    if cfg.softplus:
        y = jnp.concatenate(
            [jax.nn.softplus(y[..., :1]), y[..., 1:]], axis=-1)
    return y
