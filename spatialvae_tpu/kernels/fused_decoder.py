"""Fused Pallas decoder tail — the north-star kernel (BASELINE.json).

The spatial generator's hot path is, per (image b, pixel p):

    h0  = x0[p]*w0[b] + x1[p]*w1[b] + c[b]       # pose-folded first layer
    a0  = tanh(h0)
    a_l = tanh(a_{l-1} @ W_l + b_l [+ a_{l-1}])  # L-1 hidden (H,H) layers
    y   = sigmoid(a_{L-1} @ Wh + bh)             # (H,n_out) head

where (w0, w1, c) already encode the reparameterised rotation, translation
and latent contribution (models/spatial.py fold).  Under plain XLA the
(B, HW, H) activations round-trip HBM between GEMMs; this kernel keeps every
intermediate in VMEM:

- forward: grid (B, HW/Pt); each step builds h0 for a (Pt, H) tile with two
  lane-broadcast FMAs, runs the hidden GEMMs on the MXU with f32
  accumulation, computes the head as a small-M matmul ((No,H) x (Pt,H)^T:
  n_out pads only to 8 sublanes instead of 128 lanes), and writes the
  (1, No, Pt) output tile — plus, when the backward will want them, the
  hidden activations as residuals.
- backward (custom VJP): same tiling; a0 is recomputed from the fold
  (VPU-only), the forward's own sigmoid output is the head's backward
  residual, and a_1..a_{L-1} come EITHER from saved residuals or from an
  in-kernel recompute of the forward chain — an ADAPTIVE, shape-static
  choice (round 5): the (Lh, B, HW, H) residual is the fast path when it
  fits (its DMA overlaps compute — MEASURED: recompute-always cost 19%
  on the B=2048 parity bench, 112.2 vs ~91 ms/step, because these
  kernels are MXU/VPU-bound and the rebuilt GEMMs are pure additive MXU
  time), but at 16 GB for B=4096 it OOMs 15.75 GB of HBM, so past
  _RESIDUAL_BYTES_MAX the backward recomputes instead and the capacity
  ceiling disappears.  dW/db accumulate into constant-index output
  blocks across the sequential TPU grid; per-image (dw0, dw1, dc) fold
  gradients accumulate over pixel tiles.

Gradients w.r.t. theta/dx/z/coord_linear/latent_linear then flow through the
fold's own (cheap) autodiff in XLA.

Supported shape family: the foldable SpatialGenerator (no
expand_coords/bilinear — those make the first layer nonlinear in x) with
2..5 layers, optional resid, n_out <= 8.  Other configs use the XLA path
(objectives/elbo.py chooses automatically).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spatialvae_tpu.core.config import SpatialGeneratorConfig


def _interpret() -> bool:
    """SPATIALVAE_INTERPRET=1: per-call interpret (plain XLA lowering) for
    CPU mesh tests/dryruns — pltpu.force_tpu_interpret_mode around
    shard_map livelocks in the Mosaic interpreter's device-barrier clocks
    (CLAUDE.md), so the dryrun sets this env hook instead."""
    from spatialvae_tpu.kernels.config import KernelConfig

    return KernelConfig.from_env().interpret


# largest activation residual the VJP will save (bytes).  8.5 GiB keeps
# the measured-fast residual path for every shipping config (8 GB at
# B=2048/HW=4096/H=500 bf16 ran at 22.5k img/s) while routing the shapes
# that OOM'd (16 GB at B=4096) to the recompute backward.  Shape-static:
# the choice is made from array shapes at trace time, never from env.
_RESIDUAL_BYTES_MAX = int(8.5 * 1024 ** 3)


def _save_acts(b: int, hw: int, h: int, lh: int, dtype) -> bool:
    return lh * b * hw * h * jnp.dtype(dtype).itemsize <= _RESIDUAL_BYTES_MAX


def can_fuse_decoder(cfg: SpatialGeneratorConfig, hw: int) -> bool:
    # non-aligned pixel counts are padded with dummy coordinates in
    # fused_spatial_generator; tiny images aren't worth a kernel launch
    return (not cfg.expand_coords and not cfg.bilinear
            and 2 <= cfg.num_layers <= 5 and cfg.n_out <= 8 and hw >= 256)


def _pick_tile(hw: int, n_hidden: int, backward: bool, dtype) -> int:
    """Pixel-tile size bounded by VMEM (~16 MB scoped): the forward keeps
    ~(3 + n_hidden) (Pt, H) buffers live, the backward ~(6 + n_hidden);
    float32 weights/residuals double every buffer vs bfloat16."""
    budget = 2048 if n_hidden <= 1 else 512
    if backward and n_hidden > 2:
        budget = 256
    if dtype == jnp.float32:
        budget //= 2
    for t in (2048, 1024, 512, 256, 128):
        if t <= budget and hw % t == 0:
            return t
    return hw


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, f_ref, wh_ref, bh_ref, wht_ref, bht_ref,
                y_ref, *acts_rest, resid: bool):
    """One (image, pixel-tile) grid step.

    x_ref: (Pt, 2) coords; f_ref: (1, 4, H) folded rows [w0, w1, c, 0];
    wh_ref: (Lh, H, H) stacked hidden weights; bh_ref: (Lh, H);
    wht_ref: (No, H) pre-transposed head; bht_ref: (No, 1);
    y_ref: (1, No, Pt) output tile; acts_rest holds the (Lh, 1, Pt, H)
    residual ref iff the VJP chose the residual backward (see module
    docstring) — the primal/eval forward and the recompute VJP emit y
    only.
    """
    acts_ref = acts_rest[0] if acts_rest else None
    x0 = x_ref[:, 0:1]                         # (Pt, 1)
    x1 = x_ref[:, 1:2]
    w0 = f_ref[0, 0:1, :]                      # (1, H)
    w1f = f_ref[0, 1:2, :]
    c = f_ref[0, 2:3, :]

    h0 = x0 * w0 + x1 * w1f + c                # (Pt, H) lane-broadcast FMAs
    a = jnp.tanh(h0)

    n_hidden = wh_ref.shape[0]
    for l in range(n_hidden):
        h = jnp.dot(a.astype(wh_ref.dtype), wh_ref[l],
                    preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) + bh_ref[l:l + 1, :]
        if resid:
            h = h + a
        a = jnp.tanh(h)
        if acts_ref is not None:
            acts_ref[l, 0] = a.astype(acts_ref.dtype)

    a1c = a.astype(wht_ref.dtype)
    z2t = jax.lax.dot_general(
        wht_ref[:, :], a1c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    z2t = z2t + bht_ref[:, 0:1].astype(jnp.float32)
    y_ref[0] = jax.nn.sigmoid(z2t)


def _fwd_pallas(fold, coords, whid, bhid, wht, bht, resid, emit_acts):
    b, _, h = fold.shape
    hw = coords.shape[0]
    n_out = wht.shape[0]
    lh = whid.shape[0]
    pt = _pick_tile(hw, lh, backward=False, dtype=whid.dtype)
    grid = (b, hw // pt)

    out_specs = pl.BlockSpec((1, n_out, pt), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, n_out, hw), jnp.float32)
    if emit_acts:
        out_specs = (out_specs,
                     pl.BlockSpec((lh, 1, pt, h), lambda i, j: (0, i, j, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((lh, b, hw, h), whid.dtype))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, resid=resid),
        grid=grid,
        in_specs=[
            pl.BlockSpec((pt, 2), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lh, h, h), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lh, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_out, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_out, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        # the 16 MB scoped-vmem default is a compiler heuristic (v5e has
        # 128 MB/core); some batch shapes land a few hundred KB over it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
        interpret=_interpret(),
    )(coords, fold, whid, bhid, wht, bht)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(x_ref, f_ref, wh_ref, bh_ref, wht_ref, *rest,
                resid: bool, save_acts: bool):
    """Backward for one tile.

    Two variants (module docstring): with ``save_acts`` the hidden
    activations come from the forward's (Lh, 1, Pt, H) residual ref (the
    measured-fast path — its DMA overlaps compute); without it the whole
    chain h0/a0..a_{Lh} is rebuilt in-kernel (the capacity path for
    shapes whose residual would OOM HBM).  The rebuilt activations are
    fresh f32 tanh values; the MXU consumes the same weight-dtype casts
    the forward produced, so the GEMM operands are bit-identical across
    the variants (the recompute tanh' factors gain f32 precision).
    y_ref: (1, No, Pt) is the forward's sigmoid output (the head's
    backward residual in BOTH variants).

    g_ref: (1, No, Pt) cotangent of y.  Accumulators dwh/dbh/dwht/dbht use
    constant index maps — the TPU grid runs sequentially, so += is safe.
    df_ref (1, 4, H) accumulates over the pixel-tile axis per image.
    """
    if save_acts:
        acts_ref, y_ref, g_ref = rest[:3]
        outs = rest[3:]
    else:
        acts_ref = None
        y_ref, g_ref = rest[:2]
        outs = rest[2:]
    df_ref, dwh_ref, dbh_ref, dwht_ref, dbht_ref = outs
    i = pl.program_id(0)
    j = pl.program_id(1)

    x0 = x_ref[:, 0:1]
    x1 = x_ref[:, 1:2]
    w0r = f_ref[0, 0:1, :]
    w1r = f_ref[0, 1:2, :]
    cr = f_ref[0, 2:3, :]

    h0 = x0 * w0r + x1 * w1r + cr
    a0 = jnp.tanh(h0)

    n_hidden = wh_ref.shape[0]
    if save_acts:
        acts = [acts_ref[l, 0].astype(jnp.float32)
                for l in range(n_hidden)]
    else:
        acts = []                              # a_1..a_Lh, f32 (Pt, H)
        a = a0
        for l in range(n_hidden):
            hl = jnp.dot(a.astype(wh_ref.dtype), wh_ref[l],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.DEFAULT
                         ) + bh_ref[l:l + 1, :]
            if resid:
                hl = hl + a
            a = jnp.tanh(hl)
            acts.append(a)
    a_last = acts[-1]

    s = y_ref[0]                               # (No, Pt) = sigmoid(z2)
    dz2t = g_ref[0] * s * (1.0 - s)
    dz2c = dz2t.astype(wht_ref.dtype)

    # dWh^T (No, H) = dz2t (No, Pt) . a_last (Pt, H)
    a_lastc = a_last.astype(wht_ref.dtype)
    dwht = jax.lax.dot_general(
        dz2c, a_lastc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    dbht = jnp.sum(dz2t, axis=1, keepdims=True)            # (No, 1)
    # da (Pt, H) = dz2t (No, Pt)^T . wht (No, H) — K = n_out, tiny
    da = jax.lax.dot_general(
        dz2c, wht_ref[:, :], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)

    first_step = jnp.logical_and(i == 0, j == 0)
    dwh_acc = []
    dbh_acc = []
    a_out = a_last
    for l in range(n_hidden - 1, -1, -1):
        a_in = acts[l - 1] if l > 0 else a0
        dh = da * (1.0 - a_out * a_out)        # tanh'
        dhc = dh.astype(wh_ref.dtype)
        a_inc = a_in.astype(wh_ref.dtype)
        dwl = jax.lax.dot_general(             # a_in^T . dh -> (H, H)
            a_inc, dhc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
        dbl = jnp.sum(dh, axis=0, keepdims=True)
        da = jax.lax.dot_general(              # dh . W_l^T -> (Pt, H)
            dhc, wh_ref[l], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
        if resid:
            da = da + dh
        dwh_acc.append((l, dwl))
        dbh_acc.append((l, dbl))
        a_out = a_in

    dh0 = da * (1.0 - a0 * a0)                 # (Pt, H)
    dw0r = jnp.sum(x0 * dh0, axis=0, keepdims=True)    # (1, H)
    dw1r = jnp.sum(x1 * dh0, axis=0, keepdims=True)
    dcr = jnp.sum(dh0, axis=0, keepdims=True)
    dfold = jnp.concatenate([dw0r, dw1r, dcr,
                             jnp.zeros_like(dcr)], axis=0)[None]  # (1,4,H)

    @pl.when(first_step)
    def _():
        for l, dwl in dwh_acc:
            dwh_ref[l] = dwl
        for l, dbl in dbh_acc:
            dbh_ref[l:l + 1, :] = dbl
        dwht_ref[:, :] = dwht
        dbht_ref[:, :] = dbht

    @pl.when(jnp.logical_not(first_step))
    def _():
        for l, dwl in dwh_acc:
            dwh_ref[l] += dwl
        for l, dbl in dbh_acc:
            dbh_ref[l:l + 1, :] += dbl
        dwht_ref[:, :] += dwht
        dbht_ref[:, :] += dbht

    @pl.when(j == 0)
    def _():
        df_ref[:, :, :] = dfold

    @pl.when(j != 0)
    def _():
        df_ref[:, :, :] += dfold


def _bwd_pallas(fold, coords, whid, bhid, wht, acts, y, g, resid):
    """``acts`` is the saved (Lh, B, HW, H) residual, or None for the
    recompute variant (module docstring)."""
    b, _, h = fold.shape
    hw = coords.shape[0]
    n_out = wht.shape[0]
    lh = whid.shape[0]
    pt = _pick_tile(hw, lh, backward=True, dtype=whid.dtype)
    grid = (b, hw // pt)
    save_acts = acts is not None

    out_shapes = (
        jax.ShapeDtypeStruct((b, 4, h), jnp.float32),      # dfold
        jax.ShapeDtypeStruct((lh, h, h), jnp.float32),     # dW hidden
        jax.ShapeDtypeStruct((lh, h), jnp.float32),        # db hidden
        jax.ShapeDtypeStruct((n_out, h), jnp.float32),     # dWh^T
        jax.ShapeDtypeStruct((n_out, 1), jnp.float32),     # dbh^T
    )
    out_specs = (
        pl.BlockSpec((1, 4, h), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((lh, h, h), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((lh, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_out, h), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_out, 1), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    )
    in_specs = [
        pl.BlockSpec((pt, 2), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, h), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((lh, h, h), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((lh, h), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_out, h), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [coords, fold, whid, bhid, wht]
    if save_acts:
        in_specs.append(pl.BlockSpec((lh, 1, pt, h),
                                     lambda i, j: (0, i, j, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(acts)
    in_specs += [
        pl.BlockSpec((1, n_out, pt), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_out, pt), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    operands += [y, g]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, resid=resid, save_acts=save_acts),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
        interpret=_interpret(),
    )(*operands)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_decoder_tail(fold: jnp.ndarray, coords: jnp.ndarray,
                       whid: jnp.ndarray, bhid: jnp.ndarray,
                       wht: jnp.ndarray, bht: jnp.ndarray,
                       resid: bool = False) -> jnp.ndarray:
    """fold: (B, 4, H) rows [w0, w1, c, unused]; coords: (HW, 2);
    whid: (Lh, H, H) stacked hidden weights; bhid: (Lh, H);
    wht: (n_out, H) pre-transposed head weight; bht: (n_out,).
    Returns sigmoid head output (B, n_out, HW) float32.

    The primal (eval/display) never emits an activation residual; the
    VJP saves one only when it fits _RESIDUAL_BYTES_MAX (see module
    docstring)."""
    return _fwd_pallas(fold, coords, whid, bhid, wht, bht[:, None], resid,
                       emit_acts=False)


def _vjp_fwd(fold, coords, whid, bhid, wht, bht, resid):
    b, _, h = fold.shape
    hw = coords.shape[0]
    lh = whid.shape[0]
    if _save_acts(b, hw, h, lh, whid.dtype):
        y, acts = _fwd_pallas(fold, coords, whid, bhid, wht, bht[:, None],
                              resid, emit_acts=True)
    else:
        y = _fwd_pallas(fold, coords, whid, bhid, wht, bht[:, None],
                        resid, emit_acts=False)
        # residual would blow HBM — the backward recomputes the chain;
        # zero-size sentinel keeps the residual pytree array-only
        acts = jnp.zeros((0,), whid.dtype)
    return y, (fold, coords, whid, bhid, wht, acts, y)


def _vjp_bwd(resid, res, g):
    fold, coords, whid, bhid, wht, acts, y = res
    dfold, dwh, dbh, dwht, dbht = _bwd_pallas(
        fold, coords, whid, bhid, wht, acts if acts.size else None, y,
        g.astype(jnp.float32), resid)
    return (dfold.astype(fold.dtype), None, dwh.astype(whid.dtype),
            dbh.astype(whid.dtype), dwht.astype(wht.dtype),
            dbht[:, 0].astype(wht.dtype))


fused_decoder_tail.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# integration helper
# ---------------------------------------------------------------------------


def fused_spatial_generator(params, cfg: SpatialGeneratorConfig,
                            coords: jnp.ndarray, theta, dx, z) -> jnp.ndarray:
    """Drop-in replacement for spatial_generator_apply_folded using the
    fused kernel.  Pose fold + weight stacking + head transpose + optional
    softplus stay in XLA (cheap, and the fold's autodiff provides
    dtheta/ddx/dz/dcoord/dlatent)."""
    from spatialvae_tpu.models.spatial import fold_pose_into_first_layer

    w0, w1f, c = fold_pose_into_first_layer(params, cfg, theta, dx, z)
    zeros = jnp.zeros_like(c)
    fold = jnp.stack([w0, w1f, c, zeros], axis=1)      # (B, 4, H)
    hidden = params["layers"][:-1]
    head = params["layers"][-1]
    whid = jnp.stack([p["w"] for p in hidden])         # (Lh, H, H)
    bhid = jnp.stack([p["b"] for p in hidden])         # (Lh, H)
    hw = coords.shape[0]
    pad = (-hw) % 256                                  # tile-align pixels
    coords_p = coords.astype(jnp.float32)
    if pad:
        coords_p = jnp.concatenate(
            [coords_p, jnp.zeros((pad, 2), jnp.float32)], axis=0)
    yt = fused_decoder_tail(fold, coords_p, whid, bhid,
                            head["w"].T, head["b"],
                            cfg.resid)                 # (B, No, HW+pad)
    y = jnp.swapaxes(yt[..., :hw], 1, 2)               # (B, HW, No)
    if cfg.softplus:
        y = jnp.concatenate(
            [jax.nn.softplus(y[..., :1]), y[..., 1:]], axis=-1)
    return y
