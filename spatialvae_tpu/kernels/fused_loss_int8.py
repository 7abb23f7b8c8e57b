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

Supported families: foldable SpatialGenerator, num_layers=2, no resid, no
softplus, HW % tile == 0, even batch, with the bernoulli likelihood
(n_out<=8 — galaxy flagship), the gaussian likelihood (n_out=1 — the
particles no-fit-noise configs), or the colored likelihood (n_out=2 —
particles --fit-noise with the reference's interleaved mu/logvar split,
round 5), each with an optional per-pixel mask.  CTF runs fall back to
the XLA path (the FFT stays in XLA).
Reference math: /root/reference/spatial_vae/models.py:90-132 +
train_galaxy.py:27-128 (BCE x channels) + train_particles.py:102-139
(masked gaussian; fit-noise interleave + sq/var + logvar).

Colored-family tiling (round 5): the reference flattens the (B, HW, 2)
head row-major and splits at HW (train_particles.py:107-110), so image
pixel s+2q+c reads its MEAN from decoder pixel s/2+q channel c and its
LOGVAR from decoder pixel HW/2+s/2+q channel c — a cross-tile pairing
under the natural pixel order.  The kernel instead consumes CHUNK-
PERMUTED coords (_colored_coords): tile t's first Pt/2 rows are the
mean coords, its last Pt/2 rows the matching logvar coords, so the
pairing becomes a static lane-axis split of the (2, Pt) head output and
every tile is self-contained.  dfold/db/dW contractions sum over all
pixel rows, so the permutation is algebraically invisible to them;
targets/mask arrive pre-paired as (B, 2, HW/2) / (2, HW/2) tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spatialvae_tpu.core.config import SpatialGeneratorConfig
from spatialvae_tpu.kernels.config import KernelConfig
from spatialvae_tpu.kernels.fused_decoder_int8 import _quant_sym


def _quant_sym4(w: jnp.ndarray):
    """PER-ROW (fan-in) symmetric int4 quantisation of w1, values held in
    int8 (this runtime cannot create int4 HBM arrays — the kernel casts to
    int4 in VMEM).

    Row scales cost nothing in the kernel: da0 = dh1q4 @ w1q4^T picks up
    scale s[i] on COLUMN i, which commutes through the elementwise dh0
    chain and the dfold contraction — it is applied to the (4, H) dfold
    tile.  Returns (q, s) with s shaped (1, H) for that column scaling."""
    s = (jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1, keepdims=True)
         / 7.0 + 1e-12)                                    # (H, 1)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -7, 7
                 ).astype(jnp.int8)
    return q, s.reshape(1, -1).astype(jnp.float32)


# KNOB DEFAULTS LIVE IN kernels/config.py (KernelConfig — the one frozen
# source; env overrides are resolved there and numerics-changing ones are
# rejected at trainer entry unless SPATIALVAE_ALLOW_KNOBS=1).  The
# measurement record below explains WHY each default is what it is.
#
# gradient-GEMM precision ('da0_i4' | 'i8' | 'i4fwd') and first-layer build
# engine, overridable via SPATIALVAE_INT4_GRADS / SPATIALVAE_MXU_BUILD for
# on-chip A/B measurement (tools/kernel_bench.py, tools/int8_horizon.py).
# 'i4fwd' additionally runs the forward hidden GEMM in int4 (4-bit a0 with
# per-column 4-bit W1): contraction (1,0) IS int4-legal, so the row layout
# gets the 1.74x rate on the fwd GEMM too — at the cost of 4-bit forward
# noise in the BCE itself (gate on tools/int8_horizon.py evidence).
# Mosaic constraint: int4 dots compile for contractions (1,0)/(1,1) but NOT
# (0,0) — the dw1 reduction pattern — so only da0 can ride the 1.74x int4
# MXU rate (tools/probe_int4.py; /tmp probe of all contraction patterns).
# The MXU first-layer build measured SLOWER than the VPU broadcast chain
# (60.8 vs 58.8 ms at B=2048: two extra per-matmul launches per grid step
# beat the 3 VPU passes they replace), so it defaults off.
# round-3 default: int4 forward too (46.7 vs 48.5 ms at B=2048).  Quality
# gates: 30-epoch horizons — fields data max gap 0.107% (epoch-2
# transient, steady 0.015%), galaxy-proxy data (saturated sigmoids, dark
# skies) recorded in BASELINE.md — both 10x+ inside the 1% int8 contract.
# Under the 'tile' gradient scale 'i4dw1' (transposed int4 dw1) measured
# 47.07 — the in-kernel transpose's VPU cost ate the MXU saving.  Under
# 'bound' (see _GSCALE_DEFAULT) the ranking flips: i4dw1 needs NO int8
# gradient copy at all (the single int4 tile feeds da0 and, transposed,
# dw1), and bound+i4dw1 measured 42.03 vs 46.70 ms — the round-3 default
# pair (same horizon gates re-run, recorded in BASELINE.md).
# images per grid step (SPATIALVAE_PIPE_IMGS).  Measured at B=2048, pt=1024
# under the round-2 'tile' gradient scale: depth 2 = 51.2 ms, 4 = 48.4,
# 8 = 55.8 (VMEM pressure breaks Mosaic's block double-buffering).  Under
# the round-3 bound+i4dw1 default the per-image transient set shrinks (no
# dh1/da1-bf16/int8-q materialisations), and the ranking flips: depth
# 8 = 40.3 ms vs depth 4 = 42.0 — deeper stagger now fits VMEM and buys
# more MXU/VPU overlap.  Re-sweep after any change to the p4-p6 transients.
# tanh engine for the two in-kernel activation sites (SPATIALVAE_TANH):
# 'exact' = jnp.tanh; 'pade' = clamped Padé(5,4) with an approximate VPU
# reciprocal.  MEASURED: pade is much SLOWER (63.2 vs 48.5 ms at B=2048)
# — jnp.tanh lowers to a cheap native VPU op on TPU, so the explicit
# ~9-op rational chain triples the activation cost.  Conclusion recorded
# because it localises the kernel's VPU exposure to the SIMPLE passes
# (builds/FMAs/quant chains/casts), not the transcendentals.
# epilogue elementwise dtype (SPATIALVAE_EPI): 'bf16' keeps the round-2
# behaviour (da1/dh1/dh0 chains in bf16); 'f32' keeps the p5/p7 chains in
# f32 with bf16 only at the MXU-operand boundaries — motivated by the
# round-2 finding that Mosaic's bf16 elementwise is SLOWER than f32
# (repacking overhead), which was measured for build/p1 but never for the
# epilogue.  f32 also drops the bf16 quant-scale dance (exact f32 scale).
# gradient-quant scale engine (SPATIALVAE_GSCALE):
#   'tile'  — round-2 behaviour: per-tile max|dh1| (one abs+max reduce pass
#             plus a separate scale/round pass over every (Pt, H) tile).
#   'bound' — analytic per-step bound (host side) tightened per-tile by
#             max|dz2| in-kernel:
#                 |dh1| <= |da1| <= max|dz2_tile| * max_j sum_i |wht[i,j]|
#             so the quant scale needs NO (Pt, H) reduce (dz2 is 2 orders
#             smaller) and the whole p5 chain collapses to ONE fused pass
#             from the f32 da1 accumulator straight to the int tile — no
#             dh1 materialisation, no separate scale pass, and p4's bf16
#             cast pass disappears too.  db1 sums the pre-round scaled
#             tile (exact modulo bf16 tanh'), so db1 carries no int4
#             noise.  The bound rides the otherwise-unused sw SMEM slot,
#             keeping the operand list unchanged (adding operands
#             measurably broke XLA-side fusion around the pallas_call in
#             round 2).  The cost is a coarser quant step (bound / actual
#             tile max typically 2-5x, i.e. 1-2 effective bits of the
#             int4 gradient) — a QUALITY trade gated by the 30-epoch
#             horizon runs like every other int4 lever.
#             MEASURED (B=2048, pt=1024): tile/i4fwd 46.70; bound/i4fwd
#             45.48; bound/i4dw1 42.03 (DEFAULT — i4dw1's single int4
#             gradient tile is exactly what bound's one-pass chain emits;
#             the f32-CAST variant of this chain was SLOWER, 47.63: read
#             the f32 accumulator, do not cast up a bf16 copy).
#             i4-family grad modes only (i8 and da0_i4 carry w1's
#             per-tensor scale in sw).
# int8 hidden activation a1 (SPATIALVAE_A1Q): quantize a1 with the STATIC
# tanh scale (|a1| <= 1 -> scale 127) so the head forward GEMM, dwht and
# da1 all run int8 and every consumer of the (Pt, H) a1 tile reads int8
# (0.5 MB) instead of bf16 (1 MB) — the kernel's VPU exposure is at the
# single-touch VMEM-traffic floor, so the remaining lever is narrower
# tiles.  dz2 is quantized per-tile too ((No, Pt) — 2 orders smaller,
# ~free); its 8-bit noise reaches da1 at ~3% of the int4 dh1 quant step.
# The forward BCE picks up 8-bit a1/wht rounding (16x finer than i4fwd's
# 4-bit forward noise, which already gated fine).  Only wired for the
# bound+bf16-epilogue i4 stack (the default).
# MEASURED (B=2048): SLOWER despite the 2 MB/image-tile traffic saving —
# 45.23 ms (pt1024/d8) / 47.07 (d4) / 45.49 (pt2048) vs 40.32 baseline.
# Same failure class as 'i4all' and the transposed kernel: one int8 tile
# feeding MXU ops with DIFFERENT contraction patterns ((1,1) head fwd,
# (1,0) dwht) plus the K=3 (0,0) int8 da1 forces whole-tile relayouts
# that swamp the VPU byte saving.  Kept default-off for future Mosaic
# releases; interpret-mode parity pinned in tests/test_kernels_int8.py.
# stochastic rounding default (SPATIALVAE_SR); see _lossgrad_pallas.
# NOTE: pltpu.stochastic_round only targets float dtypes (bf16/fp8) in
# this runtime, so integer SR is implemented manually as floor(x + u)
# with a PRNG-derived uniform — ~3 extra VPU ops per quant site, so SR is
# a QUALITY lever (unbiased int4 rounding), not a speed one.


def _sr_int(x, rbits, lo, hi):
    """Stochastically round f32 x to integers in [lo, hi], returned int8.

    floor(x + u) with u ~ U[0, 1) built from the mantissa-fill bitcast
    trick: (bits & 0x7fffff) | 0x3f800000 reinterprets as f32 in [1, 2)."""
    u = pltpu.bitcast(
        (rbits & jnp.uint32(0x7FFFFF)) | jnp.uint32(0x3F800000),
        jnp.float32) - 1.0
    return jnp.clip(jnp.floor(x + u), lo, hi).astype(jnp.int8)


def _tanh_pade(x):
    """Clamped Padé(5,4) tanh, clipped to [-1, 1]: max |err| 1.36e-3 —
    below the int8 activation quant step (1/127 = 7.9e-3) and bf16
    resolution (2^-9), so quality-free at both kernel activation sites.

    ~9 cheap VPU ops (mult/FMA/approx-reciprocal) vs the transcendental
    jnp.tanh lowering.  Outside the fit range the rational overshoots 1
    (unbounded as x/15) so the clip is mandatory — int8 casts downstream
    would otherwise wrap."""
    t = x * x
    num = x * (945.0 + t * (105.0 + t))
    den = 945.0 + t * (420.0 + 15.0 * t)
    r = num * pl.reciprocal(den, approx=True)
    return jnp.clip(r, -1.0, 1.0)


def _pick_tile(hw: int) -> int:
    # pt=1024 measured marginally faster than 2048 (56.30 vs 56.95 ms at
    # B=2048) and keeps the working set lean; non-divisor requests are
    # ignored (KernelConfig.from_env already drops non-positive ones)
    req = KernelConfig.from_env().loss_tile
    if req is not None and hw % req == 0:
        return req
    for t in (1024, 512, 256):
        if hw % t == 0:
            return t
    return hw


def hw_tiles_ok(hw: int) -> bool:
    """THE pixel-count tiling contract: one definition shared by
    can_fuse_loss_int8 and parallel.pixel.can_pixel_shard (which applies
    it per shard) so the two gates cannot drift."""
    return hw >= 1024 and hw % _pick_tile(hw) == 0


def padded_hw(hw: int) -> int:
    """Smallest tile-aligned pixel count >= hw (and >= the kernel's 1024
    floor).  The bernoulli/gaussian families run non-aligned images
    (MNIST's 784, the CTF-forced odd cryo-EM dims like 65x65=4225) by
    zero-padding coords/targets and FORCING a mask whose pad rows are 0:
    masked dz2 is exactly 0 there, so every gradient contribution of a
    pad pixel vanishes (dw1/da0 consume dz2-derived int tiles that
    quantize 0 to 0; dfold's pad coord rows are zero as well) and the
    loss equals the unpadded computation exactly.  Colored keeps the
    aligned requirement (its mu/logvar half-pairing does not survive a
    tail pad)."""
    return max(1024, -(-hw // 256) * 256)


def can_fuse_loss_int8(cfg: SpatialGeneratorConfig, hw: int,
                       likelihood: str) -> bool:
    """Bernoulli (galaxy/mnist BCE), gaussian (particles no-fit-noise,
    train_particles.py:139) and colored (particles --fit-noise,
    train_particles.py:102-137) all ride the kernel: gaussian replaces
    p3's (s - y) with mask*(s - y_mu)*s*(1 - s); colored splits the
    (2, Pt) head output at the lane midpoint into the interleaved
    mu/logvar pair over chunk-permuted coords (see module docstring) —
    same (No, Pt)-order elementwise footprint, identical phases
    everywhere else.  The elbo-level gate additionally requires the
    reference's interleaved split semantics (ElboConfig
    .fit_noise_interleaved — the per-channel variant keeps XLA)."""
    if likelihood == "gaussian":
        # grayscale particles head only
        if cfg.n_out != 1:
            return False
    elif likelihood == "colored":
        # exactly the fit-noise head: 2 outputs (mu, logvar), grayscale
        if cfg.n_out != 2:
            return False
    elif likelihood != "bernoulli":
        return False
    if not (not cfg.expand_coords and not cfg.bilinear and not cfg.resid
            and not cfg.softplus
            and cfg.num_layers == 2 and cfg.n_out <= 8):
        return False
    if likelihood == "colored":
        # the mu/logvar half-pairing does not survive a tail pad, and the
        # in-kernel lane split at Pt/2 needs 128-aligned halves — require
        # a proper 256-multiple tiling (the pt=hw single-tile fallback
        # that hw_tiles_ok would accept for any hw >= 1024 is NOT colored-
        # legal: e.g. hw=4226 would split lanes at 2113)
        return hw % 256 == 0 and hw_tiles_ok(hw)
    # bernoulli/gaussian pad non-aligned pixel counts (padded_hw).  The
    # kernel's cost scales with the PADDED count, so require the pad
    # overhead stay modest (<= ~33%, i.e. hw >= 768): MNIST's 784 -> 1024
    # and the odd cryo-EM dims (65x65=4225 -> 4352, +3%) qualify; tiny
    # images keep the XLA path
    return hw >= 768 and hw_tiles_ok(padded_hw(hw))


def _colored_coords(coords: jnp.ndarray, pt: int) -> jnp.ndarray:
    """Chunk-permute coords for the colored family so every Pt-row tile
    is a self-contained (mean rows, logvar rows) pair.

    Image pixels [s, s+Pt) need decoder rows [s/2, s/2+Pt/2) (their
    means) and [HW/2+s/2, HW/2+s/2+Pt/2) (their logvars) — see the
    module docstring.  With s = t*Pt both are contiguous Pt/2-chunks of
    the two coord halves, so the permutation is a pure reshape/stack
    (no gather).  Pt/2 >= 128 keeps the in-kernel split lane-aligned
    (_pick_tile floors at 256)."""
    hw = coords.shape[0]
    t = hw // pt
    half = pt // 2
    first = coords[: hw // 2].reshape(t, half, 2)
    second = coords[hw // 2:].reshape(t, half, 2)
    return jnp.stack([first, second], axis=1).reshape(hw, 2)


def _colored_targets(y: jnp.ndarray, hw: int) -> jnp.ndarray:
    """(B, HW[, 1]) image targets -> (B, 2, HW/2) pre-paired tiles:
    out[b, c, u] = y[b, 2u + c] — image pixel 2u+c's target sits at the
    lane its (mu, logvar) head outputs occupy (channel c, position u)."""
    b = y.shape[0]
    return y.reshape(b, hw // 2, 2).swapaxes(1, 2)


class _Phases:
    """Epilogue for one image of the pair, split into alternating VPU/MXU
    phases so two instances can be interleaved (see _kernel)."""

    def __init__(self, r, aq, acc, sw_ref, h1s_ref, b1_ref, wht_ref,
                 bht_ref, yt_ref, w1q_ref, w4s, s4_ref, x3_ref, i4,
                 grad_mode, tanh_fn=jnp.tanh, rbits=None, epi="bf16",
                 gscale="tile", a1q=False, family="bernoulli",
                 mask_ref=None, db1_mode="chain"):
        self.db1_mode = db1_mode  # 'chain' | 'qi' (see kernels/config.py)
        self.tanh = tanh_fn
        self.rbits = rbits      # (Pt, H) uint32: stochastic-round bits
        self.epi = epi          # epilogue elementwise dtype mode
        self.gscale = gscale    # gradient-quant scale engine (see top)
        self.a1q = a1q          # int8 a1 (see SPATIALVAE_A1Q at top)
        self.family = family    # 'bernoulli' | 'gaussian' (p3 dispatch)
        self.mask_ref = mask_ref  # optional (1, Pt) f32 pixel-mask tile
        self.r = r
        self.aq = aq            # (Pt, H) int8 (i4fwd: 4-bit values)
        self.acc = acc
        self.sw_ref = sw_ref
        self.h1s_ref = h1s_ref  # (1, H) fwd dequant row (sw/127, or sf/7)
        self.b1_ref = b1_ref
        self.wht_ref = wht_ref
        self.bht_ref = bht_ref
        self.yt_ref = yt_ref
        self.w1q_ref = w1q_ref
        self.w4s = w4s
        self.s4_ref = s4_ref
        self.x3_ref = x3_ref
        self.i4 = i4
        self.grad_mode = grad_mode
        # a0's dequant step (1/127, or 1/7 when the single quantisation is
        # 4-bit) — used by the dw1 dequant and the tanh' rebuild
        self.aq_inv = (1.0 / 7.0 if grad_mode in ("i4fwd", "i4dw1")
                       else 1.0 / 127.0)

    def p1_h1a1(self):                                       # VPU
        # MEASURED: doing this dequant+tanh in bf16 (int32->bf16 cast, bf16
        # FMA/tanh) was SLOWER (51.2 vs 48.3 ms) — Mosaic's bf16 elementwise
        # repacking costs more than f32's wider passes; keep f32
        h1 = (self.acc.astype(jnp.float32) * self.h1s_ref[0:1, :]
              + self.b1_ref[0:1, :])
        a1 = self.tanh(h1)
        if self.a1q:
            # int8 a1 (static tanh scale): the head GEMM, dwht and da1 all
            # go int8 and every consumer of this tile reads half the bytes
            self.a1c = jnp.clip(jnp.round(a1 * 127.0), -127, 127
                                ).astype(jnp.int8)           # (Pt, H) int8
        else:
            self.a1c = a1.astype(self.wht_ref.dtype)         # (Pt, H)
        # f32 epilogue keeps the full-precision activation alive for p5's
        # tanh' chain (no bf16 repacking there); ~2 MB/img extra VMEM
        self.a1f = a1 if self.epi == "f32" else None

    def p2_head(self):                                       # MXU
        if self.a1q:
            acc2 = jax.lax.dot_general(                      # (No, Pt) i32
                self.wht_ref[:, :], self.a1c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)
            # dequant: swht (per-tensor head scale) rides sw[0, 1]
            c = self.sw_ref[0, 1] * (1.0 / 127.0)
            z2 = acc2.astype(jnp.float32) * c
        else:
            z2 = jax.lax.dot_general(                        # (No, Pt)
                self.wht_ref[:, :], self.a1c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        self.z2 = z2 + self.bht_ref[:, 0:1].astype(jnp.float32)

    def p3_bce(self):                                        # VPU (tiny)
        sig = jax.nn.sigmoid(self.z2)
        yt_raw = self.yt_ref[self.r]                         # (No, Pt)
        if yt_raw.dtype == jnp.int8:
            # /255-grid targets stored int8 (value k/255 as k-128): half
            # the gather/DMA bytes of bf16 AND exact — bf16 targets round
            # the k/255 grid to 2^-9 (trainer._dataset_yt detects the
            # grid; real galaxy/mnist data is uint8-quantized upstream,
            # train_galaxy.py:386-387)
            yt = (yt_raw.astype(jnp.float32) + 128.0) * (1.0 / 255.0)
        else:
            yt = yt_raw.astype(jnp.float32)
        # mask tile: (1, Pt) pixel-major row for bernoulli/gaussian;
        # colored reads the full (2, Pt/2) pre-paired tile instead
        m = (None if self.mask_ref is None or self.family == "colored"
             else self.mask_ref[0:1, :].astype(jnp.float32))
        if self.family == "colored":
            # particles --fit-noise (train_particles.py:102-137): under
            # the chunk-permuted coords the (2, Pt) head output splits at
            # the lane midpoint into mu | logvar for the SAME image
            # pixels; yt/mask arrive pre-paired as (2, Pt/2) tiles.  Both
            # head channels pass the generator's unconditional sigmoid
            # (models.py:85) — the reference quirk that puts logvar in
            # (0, 1), so var in (1, e) and d/var is finite everywhere;
            # mu saturation zeroes dmu through the mu*(1-mu) factor.
            # loss = 0.5*sum(mask*(d^2/var + logvar)), matching the XLA
            # path (objectives/elbo.py colored branch) exactly.
            half = self.z2.shape[1] // 2
            mu = jax.nn.sigmoid(self.z2[:, :half])           # (2, Pt/2)
            lv = jax.nn.sigmoid(self.z2[:, half:])
            mc = (None if self.mask_ref is None
                  else self.mask_ref[:, :].astype(jnp.float32))
            vinv = jnp.exp(-lv)
            d = mu - yt                                      # (2, Pt/2)
            w = d * vinv
            per = d * w + lv
            if mc is not None:
                per = per * mc
            self.bce = 0.5 * jnp.sum(per)
            dmu = w * (mu * (1.0 - mu))
            dlv = 0.5 * (1.0 - d * w) * (lv * (1.0 - lv))
            if mc is not None:
                dmu = dmu * mc
                dlv = dlv * mc
            dz2 = jnp.concatenate([dmu, dlv], axis=1)        # (2, Pt)
        elif self.family == "gaussian":
            # particles likelihood (train_particles.py:126-139): the
            # generator's sigmoid output IS y_mu (models.py:85 appends
            # nn.Sigmoid unconditionally), loss = 0.5*sum(mask*(s-y)^2),
            # dz2 = mask*(s-y)*s*(1-s).  All (No, Pt) tiles — 2 orders
            # smaller than the hidden tiles, so the extra multiply vs
            # the bernoulli chain is invisible
            d = sig - yt
            sq = d * d
            if m is not None:
                sq = sq * m
                d = d * m
            self.bce = 0.5 * jnp.sum(sq)
            dz2 = d * (sig * (1.0 - sig))
        else:
            # torch BCE clamps each log term at -100 (train_mnist.py:81)
            log_s = jnp.maximum(jnp.log(sig), -100.0)
            log_1ms = jnp.maximum(jnp.log1p(-sig), -100.0)
            per = yt * log_s + (1.0 - yt) * log_1ms
            if m is not None:
                per = per * m
            self.bce = -jnp.sum(per)
            # d bce / d z2 = s - y, except 0 where sigmoid saturates exactly
            dz2 = jnp.where(sig * (1.0 - sig) == 0.0, 0.0, sig - yt)
            if m is not None:
                dz2 = dz2 * m
        self.dz2 = dz2
        if self.a1q:
            # quantize the head cotangent too (it is (No, Pt) — 2 orders
            # smaller than the hidden tiles, so this pass is ~free); its
            # 8-bit noise is ~3% of the downstream int4 dh1 quant step
            self.mdz = jnp.max(jnp.abs(dz2)) + 1e-30
            self.sdz = self.mdz * (1.0 / 127.0)
            self.dz2c = jnp.clip(jnp.round(dz2 * (127.0 / self.mdz)),
                                 -127, 127).astype(jnp.int8)
        else:
            self.dz2c = dz2.astype(self.wht_ref.dtype)

    def p4_headbwd(self):                                    # MXU
        if self.a1q:
            dwht = jax.lax.dot_general(                      # (No, H) i32
                self.dz2c, self.a1c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)
            self.dwht = dwht.astype(jnp.float32) * (self.sdz
                                                    * (1.0 / 127.0))
            # (0, 0) int8 contraction is legal (the dw1 precedent); the
            # raw i32 accumulator flows to p5, scales folded there
            self.da1 = jax.lax.dot_general(                  # (Pt, H) i32
                self.dz2c, self.wht_ref[:, :], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)
            return
        self.dwht = jax.lax.dot_general(                     # (No, H)
            self.dz2c, self.a1c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        # NEGATIVE (round 3): emitting da1 bf16 straight from the matmul
        # (preferred_element_type=bfloat16, to halve p5's dominant read)
        # does not compile — 'tpu.matmul' op Expected matmul acc to be
        # 32-bit; Mosaic requires f32/i32 accumulators unconditionally
        # (same wall as the int16-acc probe, tools/probe_i16acc.py)
        da1 = jax.lax.dot_general(                           # (Pt, H)
            self.dz2c, self.wht_ref[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        # bound-gscale consumes the accumulator as-is: its single fused
        # p5 chain casts the tanh' factor up in-chain instead, so the
        # separate (Pt, H) bf16 cast pass here disappears
        keep = self.epi == "f32" or self.gscale == "bound"
        self.da1 = da1 if keep else da1.astype(jnp.bfloat16)

    def p5_dh1_f32(self):                                    # VPU, f32
        """f32-epilogue variant of p5: tanh'/quant chain entirely in f32
        (no bf16 repacking, exact f32 quant scale — no bf16-scale margin
        dance) feeding the same int8/int4 gradient tiles."""
        self.dbht = jnp.sum(self.dz2, axis=1, keepdims=True)
        dh1 = self.da1 * (1.0 - self.a1f * self.a1f)         # (Pt, H) f32
        self.db1 = jnp.sum(dh1, axis=0, keepdims=True)
        m1 = jnp.max(jnp.abs(dh1), axis=0, keepdims=True)    # (1, H)
        maxv = jnp.max(m1, axis=1, keepdims=True) + 1e-30    # (1, 1)
        if self.grad_mode != "i8":
            qs = 7.0 / maxv
            self.sg = maxv * (1.0 / 7.0)
            q = dh1 * qs
            if self.rbits is not None:
                q4i8 = _sr_int(q, self.rbits, -7, 7)
            else:
                q4i8 = jnp.clip(jnp.round(q), -7, 7).astype(jnp.int8)
            self.dh1q_dw1 = None if self.grad_mode == "i4dw1" else q4i8
            self.dh1q_da0 = q4i8.astype(self.i4)
            self.dscale = self.sg * self.s4_ref[0:1, :]      # (1, H)
        else:
            qs = 127.0 / maxv
            self.sg = maxv * (1.0 / 127.0)
            q = dh1 * qs
            if self.rbits is not None:
                q8 = _sr_int(q, self.rbits, -127, 127)
            else:
                q8 = jnp.clip(jnp.round(q), -127, 127).astype(jnp.int8)
            self.dh1q_dw1 = q8
            self.dh1q_da0 = q8
            self.dscale = self.sg * self.sw_ref[0, 0]        # (1, 1)

    def p5_dh1_bound(self):                                  # VPU, 1 pass
        """Bound-scale variant: the quant scale is the host-computed
        analytic bound riding sw (|dh1| <= max_j sum_i |wht[i,j]|, see
        _GSCALE_DEFAULT), so the chain needs no (Pt, H) reduce, no dh1
        materialisation and no separate scale pass — one fused chain from
        da1 straight to the int tile.  db1 sums the PRE-round scaled tile
        (q * qs is exact dh1 modulo bf16 rounding — db1 carries no int4
        noise).  dbht stays exact (its (No, Pt) tile is 2 orders smaller).

        MEASURED (B=2048, pt=1024): the f32 version of this chain
        (casting da1/a1c up) was SLOWER than tile mode (47.63 vs 46.70,
        i4fwd) — the casts are 2 extra full passes; the bf16 chain below
        with i4dw1 (which needs no int8 gradient copy at all) measured
        43.74 ms vs 46.70.  Keep the chain in the epilogue dtype."""
        self.dbht = jnp.sum(self.dz2, axis=1, keepdims=True)
        gb = self.sw_ref[0, 0]                               # f32 scalar
        # tighten per-tile with the dz2 magnitude (the dominant variance):
        # |da1[p, j]| <= max|dz2_tile| * sum_i |wht[i, j]| <= mdz * gb.
        # dz2 is (No, Pt) — 2 orders smaller than the (Pt, H) tiles, so
        # this reduce is ~free where the tile-mode max over dh1 is a full
        # (Pt, H) pass
        mdz = (self.mdz if self.a1q
               else jnp.max(jnp.abs(self.dz2)) + 1e-30)
        # bound mode is i4-family only (the host forces gscale='tile' for
        # i8/da0_i4, whose sw slot carries w1's per-tensor scale — a bound
        # here would both misread sw and drop that scale from dscale);
        # self-enforce the invariant instead of leaving a wrong-if-ever-
        # reached i8 branch
        assert self.grad_mode in ("i4fwd", "i4dw1"), self.grad_mode
        lv = 7.0
        qs = lv / (gb * mdz)
        self.sg = gb * mdz * (1.0 / lv)                      # exact inverse
        if self.a1q:
            # da1 arrives as the RAW i32 int8-GEMM accumulator; its
            # dequant (sdz * swht) folds into the quant scale, and the
            # tanh' factor rebuilds from the int8 a1 (half the read of
            # the bf16 tile).  gb is computed from the DEQUANTIZED head
            # weights host-side, so the bound covers the int8 rounding
            # (the clip covers the half-ulp epsilon).
            cfac = qs * (self.sdz * self.sw_ref[0, 1])
            a1d = self.a1c.astype(jnp.float32) * (1.0 / 127.0)
            q = (self.da1.astype(jnp.float32)
                 * (1.0 - a1d * a1d)) * cfac
        elif self.epi == "f32":
            q = (self.da1 * (1.0 - self.a1f * self.a1f)) * qs
        else:
            # the tanh' factor is a bf16 FMA cast up in-chain — one fused
            # pass, f32 round (bf16 roundeven does not legalize)
            one = jnp.bfloat16(1.0)
            t = one - self.a1c * self.a1c
            q = (self.da1 * t).astype(jnp.float32) * qs
        # NEGATIVE (round 3): summing db1 from the POST-round int tile
        # (SPATIALVAE_DB1=qi) measured SLOWER (43.00 vs 41.81 ms at
        # B=2048) — Mosaic already streams q's chain into both consumers
        # in one pass, so the "saved" recompute was free and the extra
        # int8 read+widen was pure cost.  Keep the exact pre-round sum.
        db1_from_qi = self.db1_mode == "qi"
        if not db1_from_qi:
            self.db1 = jnp.sum(q, axis=0, keepdims=True) * self.sg
        if self.rbits is not None:
            qi = _sr_int(q, self.rbits, -lv, lv)
        else:
            # keep the "redundant" clip (|q| <= lv is guaranteed by the
            # bound): clip+round+cast lowers to a cheap saturating
            # convert — round+cast WITHOUT the clip measured 1.5 ms
            # SLOWER (41.80 vs 40.28 at B=2048), at both quant sites
            qi = jnp.clip(jnp.round(q), -lv, lv).astype(jnp.int8)
        if db1_from_qi:
            self.db1 = (jnp.sum(qi.astype(jnp.float32), axis=0,
                                keepdims=True) * self.sg)
        self.dh1q_dw1 = None if self.grad_mode == "i4dw1" else qi
        self.dh1q_da0 = qi.astype(self.i4)
        self.dscale = self.sg * self.s4_ref[0:1, :]          # (1, H)

    def p5_dh1(self):                                        # VPU
        if self.gscale == "bound":
            return self.p5_dh1_bound()
        if self.epi == "f32":
            return self.p5_dh1_f32()
        self.dbht = jnp.sum(self.dz2, axis=1, keepdims=True)
        one = jnp.bfloat16(1.0)
        dh1 = self.da1 * (one - self.a1c * self.a1c)         # (Pt, H) bf16
        self.db1 = jnp.sum(dh1, axis=0, keepdims=True,
                           dtype=jnp.float32)
        # quantise the gradient tile in bf16 (no f32 materialisation of
        # the unscaled tile); the dequant scale is the exact f32 inverse
        # of the bf16 quant scale, so no systematic gradient-scale error
        # is introduced.  Scales stay (1, 1) arrays — Mosaic cannot
        # extract sub-32-bit scalars.  grad_mode:
        #   'da0_i4': dh1 quantised once to int4; da0 = dh1q4 @ w1q4^T
        #             rides the 1.74x int4 MXU rate (the only gradient
        #             contraction pattern Mosaic compiles in int4), with
        #             per-row w1 scales applied on the dfold tile; dw1
        #             consumes dh1q4 cast up to int8 (its 4-bit noise is
        #             per-sample and averages over B*HW=8.4M samples —
        #             validated by tools/int8_horizon.py)
        #   'i8':     round-1 behaviour
        # reduce rows in bf16 (cheap), then lanes in f32 — the all-axis
        # bf16 max lowers through a sub-32-bit scalar squeeze, rejected
        m1 = jnp.max(jnp.abs(dh1), axis=0, keepdims=True)   # (1, H) bf16
        maxv = jnp.max(m1.astype(jnp.float32), axis=1,
                       keepdims=True) + 1e-30               # (1, 1) f32
        lv = 7.0 if self.grad_mode != "i8" else 127.0
        qs_b = (lv / maxv).astype(jnp.bfloat16)             # (1, 1)
        self.sg = 1.0 / qs_b.astype(jnp.float32)            # (1, 1) f32
        # neither bf16 roundeven nor bf16 comparisons legalize in Mosaic:
        # round the scaled tile in f32 (one transient pass); with rbits,
        # stochastic rounding makes the quantisation unbiased
        q = (dh1 * qs_b).astype(jnp.float32)
        if self.rbits is not None:
            qi = _sr_int(q, self.rbits, -lv, lv)
        else:
            qi = jnp.clip(jnp.round(q), -lv, lv).astype(jnp.int8)
        if self.grad_mode != "i8":
            self.dh1q_dw1 = None if self.grad_mode == "i4dw1" else qi
            self.dh1q_da0 = qi.astype(self.i4)
            self.dscale = self.sg * self.s4_ref[0:1, :]     # (1, H)
        else:
            self.dh1q_dw1 = qi
            self.dh1q_da0 = qi
            self.dscale = self.sg * self.sw_ref[0, 0]       # (1, 1)

    def p6_gemms(self):                                      # MXU
        if self.grad_mode == "i4dw1":
            # dw1 as a (1,0) contraction — the one pattern Mosaic lowers
            # in int4 — from ONE int8->int4 transposed copy of aq; the
            # int4 dh1 tile da0 already consumes doubles as the RHS, so
            # the separate int8 dh1q copy disappears entirely.  Measured
            # (tools/probe_int4.py, pt=1024): (0,0) int8 12.9 ms,
            # pre-transposed (1,0) int4 8.2, with in-kernel transpose
            # 11.3 — the swap+cast costs ~3 ms but still nets positive,
            # and values are identical to i4fwd's (aq is already 4-bit).
            aqT = jnp.swapaxes(self.aq, 0, 1).astype(self.i4)   # (H, Pt)
            self.dw1 = jax.lax.dot_general(                  # (H, H) int4
                aqT, self.dh1q_da0, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT
            ).astype(jnp.float32) * (self.sg * self.aq_inv)
        else:
            self.dw1 = jax.lax.dot_general(                  # (H, H) int8
                self.aq, self.dh1q_dw1, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT
            ).astype(jnp.float32) * (self.sg * self.aq_inv)
        wk = self.w1q_ref if self.grad_mode == "i8" else self.w4s
        self.da0 = jax.lax.dot_general(                      # (Pt, H)
            self.dh1q_da0, wk[:, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)

    def p7_dh0(self):                                        # VPU
        # the gradient dequant scale (sg*sw) is NOT applied here: it is a
        # per-tile scalar, so it commutes with the linear dfold contraction
        # and is applied to the (4, H) result in p8 instead — one fewer
        # full (Pt, H) VPU pass
        if self.epi == "f32":
            a0d = self.aq.astype(jnp.float32) * self.aq_inv
            da0 = self.da0.astype(jnp.float32)
            self.dh0 = (da0 * (1.0 - a0d * a0d)).astype(jnp.bfloat16)
        else:
            a0d = self.aq.astype(jnp.bfloat16) * jnp.bfloat16(self.aq_inv)
            da0 = self.da0.astype(jnp.bfloat16)
            self.dh0 = da0 * (jnp.bfloat16(1.0) - a0d * a0d)

    def p8_dfold(self):                                      # MXU + tiny VPU
        # dfold rows [sum x0*dh0, sum x1*dh0, sum dh0, 0] as one MXU
        # contraction with the ones-augmented coords (Pt, 4)
        dfold = jax.lax.dot_general(                         # (4, H)
            self.x3_ref[:, :].astype(jnp.bfloat16), self.dh0,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        dfold = dfold * self.dscale                          # deferred scale
        # stash the BCE partial in dfold[3, 0]: row 3 multiplies the
        # fold's zeros row, so its cotangent is discarded by autodiff
        # (Mosaic cannot store scalars to VMEM directly)
        row = jax.lax.broadcasted_iota(jnp.int32, dfold.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, dfold.shape, 1)
        self.dfold = dfold + jnp.where((row == 3) & (col == 0),
                                       self.bce, 0.0)


def _kernel(x3_ref, f_ref, w1q_ref, sw_ref, h1s_ref, w1q4_ref, s4_ref,
            b1_ref, wht_ref, bht_ref, yt_ref, *refs, i4, grad_mode,
            mxu_build, n_img, tanh_fn=jnp.tanh, use_sr=False, epi="bf16",
            gscale="tile", a1q=False, family="bernoulli", has_mask=False,
            db1_mode="chain", phase_cut=8):
    """Grid (B//n_img, tiles): n_img images x one pixel tile per step.

    Straight-line body (no control flow until the accumulator writes) so
    the in-order machine can overlap each image's VPU chains with the
    other images' in-flight MXU work.  ``i4`` is jnp.int4 on hardware and
    jnp.int8 under interpret mode (bit-identical numerics: values are in
    [-7, 7] and accumulation is int32 either way).

    ``refs`` holds [mask_ref (iff has_mask)] + 5 output refs + 2 scratch
    refs — the mask operand exists ONLY in masked traces (round-2 lesson:
    merely ADDING unused operands broke XLA-side fusion around the
    pallas_call, +18 ms/step at the epoch level).
    """
    if has_mask:
        mask_ref, refs = refs[0], refs[1:]
    else:
        mask_ref = None
    (df_ref, dw1_ref, db1_ref, dwht_ref, dbht_ref, w4s, w4fs) = refs
    i = pl.program_id(0)
    j = pl.program_id(1)

    rbits = None
    rbits_g = None
    if use_sr:
        # one (Pt, H) bits tile per grid step, shared by the n_img staggered
        # images (rounding correlation across images is harmless — they
        # quantise different data).  Seed mixes the grid position with the
        # bias parameter's bits so the rounding pattern changes every
        # training step (a FIXED pattern would be a deterministic bias).
        bseed = jax.lax.bitcast_convert_type(b1_ref[0:1, 0:1],
                                             jnp.int32)[0, 0]
        pltpu.prng_seed(bseed ^ (i * pl.num_programs(1) + j))
        rbits = pltpu.bitcast(
            pltpu.prng_random_bits((x3_ref.shape[0], w1q_ref.shape[0])),
            jnp.uint32)
        # INDEPENDENT bits for the gradient quant site: reusing the same
        # tile for the forward aq round and the p5 gradient round makes
        # the two rounding errors correlated per element, biasing dw1
        # (E[eps_a(u)·eps_g(u)] != 0) — exactly what SR is meant to avoid
        rbits_g = pltpu.bitcast(
            pltpu.prng_random_bits((x3_ref.shape[0], w1q_ref.shape[0])),
            jnp.uint32)

    # int4 weight copies, cast once into persistent VMEM scratches (int4
    # HBM arrays are not supported by the runtime; casting (H, H) every
    # grid step would cost half a tile pass).  w4s: da0 operand (per-row
    # scales); w4fs: fwd operand in i4fwd mode (per-column scales).
    if grad_mode != "i8":
        @pl.when(jnp.logical_and(i == 0, j == 0))
        def _():
            w4s[:, :] = w1q4_ref[:, :].astype(i4)
            if grad_mode in ("i4fwd", "i4dw1"):
                w4fs[:, :] = w1q_ref[:, :].astype(i4)

    def build(r):
        if mxu_build:
            # h0 as one small MXU contraction: x3 columns [x0, x1, 1, 0]
            # against fold rows [w0, w1, c, 0] gives exactly
            # x0*w0 + x1*w1 + c — the fold layout is designed for this.
            # Measured SLOWER than the VPU chain (per-matmul launch
            # overhead); kept behind SPATIALVAE_MXU_BUILD for re-testing.
            h0 = jax.lax.dot_general(
                x3_ref[:, :], f_ref[r], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        else:
            # MEASURED: a bf16 build (bf16 broadcasts + tanh) was SLOWER
            # (52.8 vs 48.3 ms) — same bf16-elementwise finding as p1
            x0 = x3_ref[:, 0:1].astype(jnp.float32)
            x1 = x3_ref[:, 1:2].astype(jnp.float32)
            h0 = (x0 * f_ref[r, 0:1, :] + x1 * f_ref[r, 1:2, :]
                  + f_ref[r, 2:3, :]).astype(jnp.float32)
        a0 = tanh_fn(h0)
        if grad_mode in ("i4fwd", "i4dw1"):
            # single 4-bit activation quantisation: the int4 fwd GEMM,
            # the dw1 GEMM and the tanh' rebuild all consume it.  With SR
            # the 4-bit forward is UNBIASED per element (|a0| <= 1 exactly,
            # so a0*7 <= 7 and the upward SR step cannot exceed the int4
            # range), which is what makes the int4 forward defaultable
            if rbits is not None:
                aq = _sr_int(a0 * 7.0, rbits, -7, 7)
            else:
                # the clip is value-redundant (|tanh| <= 1) but SPEED-
                # positive: see the saturating-convert note in p5
                aq = jnp.clip(jnp.round(a0 * 7.0), -7, 7).astype(jnp.int8)
            # NEGATIVE (round 3): storing aq directly as int4 here (to
            # kill the separate int8->int4 cast pass and halve p6's
            # transpose bytes in i4dw1) does NOT compile — Mosaic rejects
            # tpu.transpose on int4 vectors ("Unsupported type in
            # transpose"), so i4dw1's aqT must transpose the int8 values
            acc = jax.lax.dot_general(                       # int4 x int4
                aq.astype(i4), w4fs[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)
            return aq, acc
        if rbits is not None:
            aq = _sr_int(a0 * 127.0, rbits, -127, 127)
        else:
            aq = jnp.round(a0 * 127.0).astype(jnp.int8)
        acc = jax.lax.dot_general(
            aq, w1q_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)
        return aq, acc

    # -- explicit n_img-image software pipeline -------------------------------
    # The machine issues in order with an async MXU: a VPU op dependent on
    # the previous matmul stalls (~0.5 us bubble per boundary, measured),
    # but independent work placed there executes for free.  Image r's
    # phases run r phases BEHIND image 0's, so every dependent wait of one
    # image is covered by another's adjacent-phase work — and staggering
    # means no two same-phase transients (the 4 MB da1/da0 tiles) are ever
    # all live together.
    built = [build(r) for r in range(n_img)]
    ss = [
        _Phases(r, aq, acc, sw_ref, h1s_ref, b1_ref, wht_ref, bht_ref,
                yt_ref, w1q_ref, w4s, s4_ref, x3_ref, i4, grad_mode,
                tanh_fn=tanh_fn, rbits=rbits_g, epi=epi, gscale=gscale,
                a1q=a1q, family=family, mask_ref=mask_ref,
                db1_mode=db1_mode)
        for r, (aq, acc) in enumerate(built)
    ]
    seq = ("p1_h1a1", "p2_head", "p3_bce", "p4_headbwd", "p5_dh1",
           "p6_gemms", "p7_dh0", "p8_dfold")
    # measurement harness: SPATIALVAE_PHASE_CUT=k runs only phases 1..k
    # (cumulative-suffix ablation; subtracting consecutive cuts isolates
    # in-context phase costs).  Beware suffix DCE when reading results:
    # cut=6 drops the da0 GEMM because only p7 consumes it.  Measured
    # ladder at B=2048/n4/pt1024: cut3=17.8, cut5=25.0, cut6=38.7,
    # full=48.3 — additive at probe GEMM rates, VPU+stalls ~16 ms.
    cut = phase_cut
    seq = seq[:cut]
    for t in range(len(seq) + n_img - 1):
        for r in range(n_img):
            k = t - r
            if 0 <= k < len(seq):
                getattr(ss[r], seq[k])()

    h = w1q_ref.shape[0]
    if cut >= 8:
        df_pair = jnp.stack([s.dfold for s in ss])          # (n_img, 4, H)
    else:
        z = jnp.zeros((4, h), jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
        df_pair = jnp.stack([
            jnp.where((row == 3) & (col == 0), s.bce, 0.0) for s in ss])
    if cut >= 6:
        dw1 = sum(s.dw1 for s in ss[1:]) + ss[0].dw1
    else:
        dw1 = jnp.zeros((h, h), jnp.float32)
    if cut >= 4:
        dwht = sum(s.dwht for s in ss[1:]) + ss[0].dwht
    else:
        dwht = jnp.zeros(dwht_ref.shape, jnp.float32)
    if cut >= 5:
        db1 = sum(s.db1 for s in ss[1:]) + ss[0].db1
        dbht = sum(s.dbht for s in ss[1:]) + ss[0].dbht
    else:
        db1 = jnp.zeros((1, h), jnp.float32)
        dbht = jnp.zeros(dbht_ref.shape, jnp.float32)

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


def _lossgrad_pallas(fold, coords, w1, b1, wht, bht, y_t, mask=None,
                     family: str = "bernoulli", interpret: bool = False):
    b, _, h = fold.shape
    hw = coords.shape[0]
    n_out = wht.shape[0]
    pt = _pick_tile(hw)
    tiles = hw // pt
    assert b % 2 == 0, "fused loss kernel processes image pairs"
    # pipeline depth: how many images share one grid step (halves the
    # per-grid-step overhead again at 4 and gives the scheduler more
    # independent work to cover MXU->VPU dependency stalls)
    # ALL knobs resolve through the one frozen KernelConfig (defaults =
    # the measured plateau; env overrides validated in kernels/config.py)
    kcfg = KernelConfig.from_env()
    req = kcfg.pipe_imgs
    # largest power-of-2 divisor of b that is <= the request (a raw
    # non-divisor like 6 must not silently collapse to depth 1)
    n_img = 1
    while n_img * 2 <= req and b % (n_img * 2) == 0:
        n_img *= 2
    grad_mode = kcfg.grad_mode
    # SPATIALVAE_INTERPRET=1: force the per-call interpret path (plain XLA
    # lowering of the kernel body).  Tests use this instead of
    # pltpu.force_tpu_interpret_mode around shard_map — the full Mosaic
    # interpreter's cross-device barrier clocks crawl/livelock with 8
    # virtual devices, while per-call interpret stays fast.
    interpret = interpret or kcfg.interpret

    # gradient-quant scale engine; 'bound' needs the sw slot free, so it
    # is restricted to the modes whose sw is otherwise unused ('i8' and
    # 'da0_i4' carry w1's per-tensor scale there)
    gscale = kcfg.gscale
    if grad_mode not in ("i4fwd", "i4dw1"):
        gscale = "tile"

    # epilogue elementwise dtype, resolved ONCE — the a1q gate below and
    # the kernel both consume this value, so the two can never disagree
    epi = kcfg.epi

    # int8 a1 (SPATIALVAE_A1Q): the hidden activation is quantized with
    # the static tanh scale so the head fwd GEMM, dwht and da1 run int8
    # and all three consumers of the (Pt, H) a1 tile read half the bytes.
    # Only wired for the bound-gscale bf16-epilogue i4 stack (the default).
    a1q = kcfg.a1q and gscale == "bound" and epi != "f32"

    f32 = jnp.float32
    swht = None
    if a1q:
        whtq, s_wht = _quant_sym(wht)
        swht = jnp.asarray(s_wht, f32).reshape(())
        wht_op = whtq                                        # int8 (No, H)
    else:
        wht_op = wht
    if grad_mode in ("i4fwd", "i4dw1"):
        # fwd GEMM in int4 too: per-COLUMN (fan-out) W1 scales ride as a
        # per-column dequant row on h1; the w1q input slot carries the
        # 4-bit-valued container the kernel casts into the fwd scratch
        wf4t, sf4 = _quant_sym4(w1.T)
        w1q = wf4t.T
        h1s = sf4 * (1.0 / 7.0)                              # (1, H)
        if gscale == "bound":
            # |dh1| <= max_j sum_i |wht[i,j]| — ride the sw slot (col 0);
            # under a1q the bound is over the DEQUANTIZED int8 head
            # weights and swht rides col 1 for the in-kernel dequants
            if a1q:
                gb = (jnp.max(jnp.sum(jnp.abs(
                    whtq.astype(f32)), axis=0)) * swht + 1e-30)
                sw = jnp.stack([gb, swht]).reshape(1, 2)
            else:
                gb = (jnp.max(jnp.sum(jnp.abs(wht.astype(f32)), axis=0))
                      + 1e-30)
                sw = jnp.stack([gb, jnp.float32(1.0)]).reshape(1, 2)
        else:
            sw = jnp.ones((1, 2), f32)                       # unused
    else:
        w1q, sw1 = _quant_sym(w1)
        sw = jnp.stack([jnp.asarray(sw1, f32).reshape(()),
                        jnp.float32(1.0)]).reshape(1, 2)
        h1s = jnp.broadcast_to(
            jnp.asarray(sw1, f32).reshape(1, 1) * (1.0 / 127.0),
            (1, h)).astype(f32)
    if grad_mode == "i8":
        w1q4, s4 = w1q, jnp.ones((1, h), f32)                # unused slots
    else:
        w1q4, s4 = _quant_sym4(w1)

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
        pl.BlockSpec((n_img, 4, h), lambda i, j: (i, 0, 0),
                     memory_space=vm),
        pl.BlockSpec((h, h), lambda i, j: (0, 0), memory_space=vm),
        pl.BlockSpec((1, h), lambda i, j: (0, 0), memory_space=vm),
        pl.BlockSpec((n_out, h), lambda i, j: (0, 0), memory_space=vm),
        pl.BlockSpec((n_out, 1), lambda i, j: (0, 0), memory_space=vm),
    )
    # int4 only on real TPU hardware: interpret mode (including
    # force_tpu_interpret_mode, which this flag cannot see) executes the
    # kernel as plain XLA ops, and XLA CPU rejects sub-byte dot operands.
    # int8 containers are bit-identical (values in [-7, 7], i32 acc).
    use_i4 = not interpret and jax.default_backend() == "tpu"
    i4 = jnp.int4 if use_i4 else jnp.int8
    mxu_build = kcfg.mxu_build
    # interpret mode keeps exact tanh: the approx reciprocal has no
    # interpreter lowering guarantee and tests compare against jnp.tanh
    tanh_fn = (_tanh_pade if kcfg.tanh == "pade" and not interpret
               else jnp.tanh)
    # stochastic rounding of the quant sites (SPATIALVAE_SR=1): unbiased
    # int4/int8 rounding via manual floor(x+u) — a QUALITY lever for the
    # int4 forward, costing ~3 extra VPU ops per site (see _sr_int); off
    # under interpret (tests need deterministic round-to-nearest)
    use_sr = kcfg.sr and use_i4
    in_specs = [
        pl.BlockSpec((pt, 4), lambda i, j: (j, 0), memory_space=vm),
        pl.BlockSpec((n_img, 4, h), lambda i, j: (i, 0, 0),
                     memory_space=vm),
        pl.BlockSpec((h, h), lambda i, j: (0, 0), memory_space=vm),
        pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, h), lambda i, j: (0, 0), memory_space=vm),
        pl.BlockSpec((h, h), lambda i, j: (0, 0), memory_space=vm),
        pl.BlockSpec((1, h), lambda i, j: (0, 0), memory_space=vm),
        pl.BlockSpec((1, h), lambda i, j: (0, 0), memory_space=vm),
        pl.BlockSpec((n_out, h), lambda i, j: (0, 0), memory_space=vm),
        pl.BlockSpec((n_out, 1), lambda i, j: (0, 0), memory_space=vm),
        # colored targets arrive pre-paired as (B, 2, HW/2) — each tile
        # is the (2, Pt/2) block matching the head output's lane split
        pl.BlockSpec((n_img, n_out, pt // 2 if family == "colored"
                      else pt), lambda i, j: (i, 0, j), memory_space=vm),
    ]
    if family == "colored":
        assert n_out == 2 and y_t.shape[1:] == (2, hw // 2), y_t.shape
    else:
        # hw here is the (possibly padded) coords length — targets must
        # already be padded to match (fused_bce_spatial_int8 pads per
        # step when building y_t itself; trainer._dataset_yt pads the
        # prebuilt copy once)
        assert y_t.shape[2] == hw, (y_t.shape, hw)
    operands = [x3, fold, w1q, sw, h1s, w1q4, s4, b1, wht_op, bht, y_t]
    has_mask = mask is not None
    if has_mask:
        # per-pixel mask tile, present ONLY in masked traces (adding an
        # always-there unused operand broke XLA-side fusion in round 2)
        if family == "colored":
            # pre-paired like the targets: m[c, u] masks image pixel 2u+c
            in_specs.append(pl.BlockSpec((2, pt // 2),
                                         lambda i, j: (0, j),
                                         memory_space=vm))
            operands.append(mask.reshape(hw // 2, 2).T
                            .astype(jnp.float32))
        else:
            in_specs.append(pl.BlockSpec((1, pt), lambda i, j: (0, j),
                                         memory_space=vm))
            operands.append(mask.reshape(1, hw).astype(jnp.float32))
    return pl.pallas_call(
        functools.partial(_kernel, i4=i4, grad_mode=grad_mode,
                          mxu_build=mxu_build, n_img=n_img,
                          tanh_fn=tanh_fn, use_sr=use_sr, epi=epi,
                          gscale=gscale, a1q=a1q, family=family,
                          has_mask=has_mask, db1_mode=kcfg.db1,
                          phase_cut=kcfg.phase_cut),
        grid=(b // n_img, tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((h, h), i4), pltpu.VMEM((h, h), i4)],
        # the 16 MB default scoped limit is a compiler heuristic, not the
        # hardware (v5e has 128 MB/core).  Generous caps matter: the 48.4 ms
        # n_img=4 figure was measured at 80 MB; starving the scheduler of
        # scoped VMEM (42 MB) costs >10 ms in lost double-buffering.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(
                kcfg.vmem_override_mb if kcfg.vmem_override_mb is not None
                else (40 if n_img <= 2 else (80 if pt <= 1024 else 112))
            ) * 1024 * 1024),
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# custom-vjp op: scalar BCE out, gradients precomputed in the forward pass
# ---------------------------------------------------------------------------


def _run(fold, coords, w1, b1, wht, bht, y_t, mask, family, interpret):
    dfold, dw1, db1, dwht, dbht = _lossgrad_pallas(
        fold, coords, w1, b1[None, :].astype(jnp.float32),
        wht, bht[:, None], y_t, mask=mask, family=family,
        interpret=interpret)
    # the per-image BCE rides in dfold[:, 3, 0] (see _kernel); leaving it
    # in the gradient is harmless — row 3 multiplies the fold's zeros row
    return jnp.sum(dfold[:, 3, 0]), (dfold, dw1, db1, dwht, dbht)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_decoder_bce_int8(fold, coords, w1, b1, wht, bht, y_t,
                           mask=None, family: str = "bernoulli",
                           interpret: bool = False):
    """Summed reconstruction loss of the int8 decoder over (B, HW, n_out)
    — with its gradients computed in the same kernel pass.

    family 'bernoulli': torch-clamped BCE sum; 'gaussian': 0.5*sum(
    mask*(sigmoid(head) - y)^2) (the particles likelihood — the reference
    generator sigmoids unconditionally, models.py:85).

    fold: (B, 4, H) rows [w0, w1, c, 0]; coords: (HW, 2), HW tile-aligned
    (for 'colored': ALREADY chunk-permuted via _colored_coords);
    w1: (H, H); b1: (H,); wht: (n_out, H) pre-transposed head;
    bht: (n_out,); y_t: (B, n_out, HW) targets — for 'colored' the
    pre-paired (B, 2, HW/2) layout (_colored_targets); mask: optional
    (HW,) {0,1} pixel mask (train_particles.py:126-133).

    The VJP scales the precomputed gradients by the scalar cotangent, so it
    is exact for any scalar downstream of the returned sum (the training
    loss uses loss/b).  y_t and mask are treated as constants (data).
    """
    loss, _ = _run(fold, coords, w1, b1, wht, bht, y_t, mask, family,
                   interpret)
    return loss


def _vjp_fwd(fold, coords, w1, b1, wht, bht, y_t, mask, family, interpret):
    loss, grads = _run(fold, coords, w1, b1, wht, bht, y_t, mask, family,
                       interpret)
    # zero-size dtype sentinels keep the residual pytree array-only
    sentinels = (jnp.zeros((0,), fold.dtype), jnp.zeros((0,), w1.dtype),
                 jnp.zeros((0,), b1.dtype), jnp.zeros((0,), wht.dtype))
    return loss, (grads, sentinels)


def _vjp_bwd(family, interpret, res, g):
    (dfold, dw1, db1, dwht, dbht), (f_s, w_s, b_s, h_s) = res
    return ((g * dfold).astype(f_s.dtype), None, (g * dw1).astype(w_s.dtype),
            (g * db1[0]).astype(b_s.dtype), (g * dwht).astype(h_s.dtype),
            (g * dbht[:, 0]).astype(h_s.dtype), None, None)


fused_decoder_bce_int8.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# integration helper
# ---------------------------------------------------------------------------


def fused_bce_spatial_int8(params, cfg: SpatialGeneratorConfig,
                           coords, theta, dx, z, y, y_t=None,
                           mask=None, family: str = "bernoulli",
                           interpret: bool = False):
    """Reconstruction-loss sum for the foldable int8 decoder against
    targets y: clamped-BCE (family='bernoulli') or half-sum-of-squares on
    the sigmoid output (family='gaussian', optionally masked).

    y: (B, HW) or (B, HW, C); alternatively pass ``y_t`` — the targets
    already transposed to (B, C, HW) — and the per-step relayout is skipped
    entirely (the trainer gathers batches from a dataset copy stored in
    that layout, hoisting the ~8 ms/step transpose out of the hot loop).
    Pose fold stays in XLA so dtheta/ddx/dz and the coord/latent weight
    grads flow through its autodiff from dfold.
    Returns the summed loss (scalar)."""
    from spatialvae_tpu.models.spatial import fold_pose_into_first_layer

    w0, w1f, c = fold_pose_into_first_layer(params, cfg, theta, dx, z)
    fold = jnp.stack([w0, w1f, c, jnp.zeros_like(c)], axis=1)
    hidden = params["layers"][0]
    head = params["layers"][1]
    hw = coords.shape[0]
    if family == "colored":
        # chunk-permute so each pixel tile carries its own mu AND logvar
        # rows (see module docstring); tile choice must match the
        # kernel's (_pick_tile consults the same KernelConfig)
        coords = _colored_coords(coords.astype(jnp.float32),
                                 _pick_tile(hw))
    hw_p = hw if family == "colored" else padded_hw(hw)
    if hw_p != hw:
        # non-aligned pixel counts (see padded_hw): zero-pad coords and
        # FORCE a mask whose pad rows are 0 — the masked dz2 is exactly 0
        # there, so the loss and every gradient match the unpadded math
        pad = hw_p - hw
        coords = jnp.concatenate(
            [coords.astype(jnp.float32),
             jnp.zeros((pad, 2), jnp.float32)], axis=0)
        base = (jnp.ones((hw,), jnp.float32) if mask is None
                else mask.reshape(hw).astype(jnp.float32))
        mask = jnp.concatenate([base, jnp.zeros((pad,), jnp.float32)])
    if y_t is None:
        b = y.shape[0]
        # the kernel casts target tiles to f32 at use — keep the batch in
        # its compute dtype to halve the DMA
        if family == "colored":
            y_t = _colored_targets(y, hw)
        else:
            y_t = y.reshape(b, hw, -1).swapaxes(1, 2)
            if hw_p != hw:
                y_t = jnp.concatenate(
                    [y_t, jnp.zeros(y_t.shape[:2] + (hw_p - hw,),
                                    y_t.dtype)], axis=2)
    return fused_decoder_bce_int8(fold, coords, hidden["w"], hidden["b"],
                                  head["w"].T, head["b"], y_t, mask,
                                  family, interpret)
