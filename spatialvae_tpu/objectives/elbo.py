"""Unified ELBO for all spatial-VAE training variants.

One pure ``elbo_minibatch`` replaces the three copy-pasted-and-diverged
``eval_minibatch`` functions of the reference (train_mnist.py:24-90,
train_particles.py:22-148, train_galaxy.py:27-128).  The per-CLI semantic
differences are expressed as ``ElboConfig`` fields:

- likelihood: 'bernoulli' (mnist/galaxy BCE x size), 'gaussian'
  (particles, -0.5*sum((mu-y)^2)), 'colored' (particles --fit-noise,
  -0.5*sum((mu-y)^2/var + logvar))
- theta_mean_penalty: the mnist rotation KL includes a theta_mu^2/(2 s^2)
  term (train_mnist.py:63); particles/galaxy omit it
  (train_particles.py:86, train_galaxy.py:99)
- latent layout [theta, dx, dy, z...]; unit-normal KL over translation+z
- z_scale curriculum (--z-delay), CTF correction, circular pixel mask,
  rotation-augment offset re-injection

Structured-pose decoding uses the folded first layer
(spatialvae_tpu.models.spatial) whenever the decoder permits — the rotation
and translation never materialise a transformed coordinate grid in HBM.

Reference quirk replicated (train_particles.py:102-110): with --fit-noise the
reference flattens (B, HW, 2) row-major and slices the first HW entries as
y_mu — interleaving channels across pixel pairs.  ``fit_noise_interleaved``
(default True) reproduces that exactly; set False for the per-channel
semantics the code plainly intended.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from spatialvae_tpu.core.config import InferenceConfig
from spatialvae_tpu.models import (
    inference_apply,
    spatial_generator_apply,
    vanilla_generator_apply,
)
from spatialvae_tpu.models.spatial import (
    can_fold,
    spatial_generator_apply_folded,
)
from spatialvae_tpu.transforms.coords import rotate_coords, translate_coords


@dataclass(frozen=True)
class ElboConfig:
    rotate: bool = True
    translate: bool = True
    dx_scale: float = 0.1
    theta_prior: float = 3.141592653589793
    theta_mean_penalty: bool = False
    likelihood: str = "bernoulli"          # bernoulli | gaussian | colored
    # informational only: channel handling inside elbo_minibatch is derived
    # from array shapes (target vs mask sizes); kept because it is persisted
    # in checkpoints and documents the training data for serving
    channels: int = 1
    vanilla: bool = False
    use_fold: bool = True
    fused: bool = False                    # Pallas fused decoder tail (TPU)
    int8: bool = False                     # experimental int8-MXU decoder
    fused_loss: bool = True                # single-kernel decode+BCE+grad
    fit_noise_interleaved: bool = True


@jax.custom_vjp
def _bce_elems(y_hat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-element binary cross entropy with torch's -100 log clamp AND
    torch's exact backward.

    Forward: torch.nn.functional.binary_cross_entropy clamps each log
    term at -100 (train_mnist.py:81 relies on this for saturated
    sigmoids).  Backward: autodiffing clip∘log NaNs the whole gradient
    once a sigmoid saturates to exactly 0.0/1.0 in f32 (routine for
    |logit| > ~17): the clip zeroes the cotangent but the log transpose
    still multiplies by an inf derivative, and 0*inf = NaN — even for
    correctly-predicted or masked-out pixels.  torch's
    binary_cross_entropy_backward instead computes
    (y_hat − y) / clamp_min(y_hat·(1−y_hat), 1e-12), which is finite
    everywhere and vanishes through the sigmoid chain at saturation;
    this custom VJP replicates it exactly."""
    log_y = jnp.clip(jnp.log(y_hat), -100.0, None)
    log_1my = jnp.clip(jnp.log1p(-y_hat), -100.0, None)
    return -(y * log_y + (1.0 - y) * log_1my)


def _bce_elems_fwd(y_hat, y):
    return _bce_elems(y_hat, y), (y_hat, y)


def _bce_elems_bwd(res, g):
    y_hat, y = res
    denom = jnp.maximum(y_hat * (1.0 - y_hat), 1e-12)
    d_yhat = g * (y_hat - y) / denom
    # target cotangent (targets are data in practice): the exact
    # derivative of the clamped-forward value wrt y
    d_y = g * (jnp.clip(jnp.log1p(-y_hat), -100.0, None)
               - jnp.clip(jnp.log(y_hat), -100.0, None))
    return d_yhat, d_y


_bce_elems.defvjp(_bce_elems_fwd, _bce_elems_bwd)


def _bce_sum(y_hat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Summed BCE (see _bce_elems for the clamp/backward contract)."""
    return jnp.sum(_bce_elems(y_hat, y))


def fused_loss_active(ecfg: ElboConfig, p_cfg, hw: int, batch: int) -> bool:
    """True iff elbo_minibatch will take the fused int8 loss+grad kernel
    path for this config (training, no CTF; bernoulli or gaussian, with
    or without a pixel mask).  The trainer uses this to decide whether to
    gather pre-transposed (B, C, HW) target batches."""
    if ecfg.vanilla or not (ecfg.fused and ecfg.int8 and ecfg.fused_loss):
        return False
    if (ecfg.likelihood not in ("bernoulli", "gaussian", "colored")
            or not ecfg.use_fold or batch % 2):
        return False
    if ecfg.likelihood == "colored" and not ecfg.fit_noise_interleaved:
        # the kernel implements the reference's interleaved mu/logvar
        # split (train_particles.py:107-110); the per-channel variant
        # (a library extension) keeps the XLA path
        return False
    if not can_fold(p_cfg):
        return False
    from spatialvae_tpu.kernels.fused_loss_int8 import can_fuse_loss_int8

    return can_fuse_loss_int8(p_cfg, hw, ecfg.likelihood)


def elbo_minibatch(
    q_params,
    p_params,
    q_cfg: InferenceConfig,
    p_cfg,
    ecfg: ElboConfig,
    coords: jnp.ndarray,                  # (HW, 2) untransformed grid
    y: jnp.ndarray,                       # (B, HW) or (B, HW, C)
    key: Optional[jax.Array],
    *,
    noise: Optional[jnp.ndarray] = None,  # (B, zdim) std-normal; overrides key
    y_inf: Optional[jnp.ndarray] = None,  # augmented view for q (default y)
    offsets: Optional[jnp.ndarray] = None,  # (B,) rotation-augment offsets
    z_scale: float | jnp.ndarray = 1.0,
    ctf: Optional[jnp.ndarray] = None,    # (B, kn, km) per-image CTF kernels
    mask: Optional[jnp.ndarray] = None,   # (HW,) float {0,1} pixel mask
    image_shape: Optional[Tuple[int, int]] = None,  # (n, m) for CTF
    want_y_hat: bool = False,             # display paths need the decode
    y_t: Optional[jnp.ndarray] = None,    # (B, C, HW) pre-transposed targets
    q_quant=None,                         # per-layer int8 encoder weights
    y_q8=None,                            # (xq (B, n) int8, sx) data batch
    pixel_axis: Optional[str] = None,     # shard_map mesh axis sharding HW
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (elbo, log_p_x_g_z, kl_div, y_hat) — scalars except y_hat.

    y_hat is None on the int8 fused-loss fast path (training/eval need only
    the scalars; pass want_y_hat=True to force the decoding path).

    ``pixel_axis`` (SURVEY §5.7, callable ONLY inside a shard_map over that
    mesh axis): coords/y_t/mask are this device's HW tile; the fused-loss
    partial is psum'd over the axis so the returned elbo/log_p/kl VALUES
    are the full-image quantities on every device, while the elbo's
    GRADIENT stays each device's local contribution (the psum transpose
    passes the replicated cotangent straight to the local partial, and the
    replicated-KL grad is scaled to kl/n via a stop_gradient identity) —
    the caller completes it with psum(grads, pixel_axis)."""
    b = y.shape[0]
    if y_inf is None:
        y_inf = y
    else:
        y_q8 = None      # augmented view: prequantized data doesn't apply

    # ---- inference + reparameterised sample -------------------------------
    # int8 encoder: quantising weights per call was measured SLOWER than
    # bf16 (round 1) — but with PREQUANTIZED weights emitted by the Adam
    # pass (q_quant, train/optimizer_pallas.py) the hidden GEMMs ride the
    # int8 MXU with only activation-quantisation overhead
    z_mu, z_logstd = inference_apply(q_params, q_cfg, y_inf.reshape(b, -1),
                                     qw=q_quant, y_q8=y_q8)
    z_std = jnp.exp(z_logstd)
    r = noise if noise is not None else jax.random.normal(
        key, z_mu.shape, dtype=z_mu.dtype)
    z = z_std * r + z_mu

    kl_div = jnp.zeros((b,), dtype=z_mu.dtype)
    theta = None
    dx = None

    rotate = ecfg.rotate and not ecfg.vanilla
    translate = ecfg.translate and not ecfg.vanilla

    if rotate:
        theta_mu = z_mu[:, 0]
        theta_std = z_std[:, 0]
        theta_logstd = z_logstd[:, 0]
        theta = z[:, 0]
        z, z_mu, z_std, z_logstd = z[:, 1:], z_mu[:, 1:], z_std[:, 1:], z_logstd[:, 1:]

        if offsets is not None:
            # invert the augmentation rotation so the generator reconstructs
            # the original pose (train_particles.py:71-74)
            theta = theta + offsets

        sigma = ecfg.theta_prior
        kl_rot = (-theta_logstd + jnp.log(sigma)
                  + theta_std ** 2 / (2.0 * sigma ** 2) - 0.5)
        if ecfg.theta_mean_penalty:
            kl_rot = kl_rot + theta_mu ** 2 / (2.0 * sigma ** 2)
        kl_div = kl_div + kl_rot

    if translate:
        dx = z[:, :2] * ecfg.dx_scale
        z = z[:, 2:]
        # note: z_mu/z_std/z_logstd keep the dx columns — the unit-normal KL
        # below covers translation and z (train_mnist.py:83-85)

    z = z * z_scale

    # ---- fused int8 decode+loss+backward fast path --------------------------
    # one Pallas kernel computes the reconstruction log-likelihood AND its
    # gradients (kernels/fused_loss_int8.py); the decode never materialises.
    # Covers bernoulli (BCE), gaussian (particles half-sum-of-squares,
    # train_particles.py:139) and colored (--fit-noise sq/var + logvar,
    # :102-137, round 5), each with an optional pixel mask (:126-133);
    # CTF runs take the XLA path below (the FFT stays in XLA)
    fused_loss_path = (not want_y_hat and ctf is None
                       and fused_loss_active(ecfg, p_cfg, coords.shape[0],
                                             b))
    if pixel_axis is not None and (not fused_loss_path or y_t is None):
        raise ValueError(
            "pixel_axis requires the fused int8 loss-kernel path with "
            "pre-transposed y_t tiles (the trainer gates pixel-sharded "
            "steps on fused_loss_active for the per-shard shapes; y is "
            "the full image here, so the kernel must not rebuild y_t "
            "from it)")
    if fused_loss_path:
        from spatialvae_tpu.kernels.config import KernelConfig
        if (KernelConfig.from_env().layout == "t" and pixel_axis is None
                and ecfg.likelihood == "bernoulli" and mask is None
                and (y_t is None or y_t.dtype != jnp.int8)):
            # (the _t experiment predates int8 /255-grid targets and the
            # gaussian/mask families — those configs take the row kernel)
            # feature-major experiment (kernels/fused_loss_int8_t.py): its
            # int4-legal gradient GEMMs save ~10 ms of MXU floor but the
            # layout costs ~16 ms of VPU relayouts — measured SLOWER than
            # the row kernel (59.2 vs 48.4 ms at B=2048); kept for re-
            # testing against future Mosaic releases (bernoulli-only)
            from spatialvae_tpu.kernels.fused_loss_int8_t import (
                fused_bce_spatial_int8_t,
            )
            loss = fused_bce_spatial_int8_t(p_params, p_cfg, coords, theta,
                                            dx, z, y, y_t=y_t)
        else:
            from spatialvae_tpu.kernels.fused_loss_int8 import (
                fused_bce_spatial_int8,
            )
            loss = fused_bce_spatial_int8(p_params, p_cfg, coords, theta,
                                          dx, z, y, y_t=y_t, mask=mask,
                                          family=ecfg.likelihood)
        # bernoulli: -(sum BCE)/B; gaussian: -0.5*sum(mask*(mu-y)^2)/B;
        # colored: -0.5*sum(mask*(sq/var + logvar))/B — all exactly the
        # XLA paths' log_p (train_mnist.py:81, train_particles.py:136-139)
        if pixel_axis is not None:
            # pixel tiles are conditionally independent given the pose:
            # the per-shard partial sums to the full loss (parallel/pixel
            # rationale).  psum INSIDE the differentiated function: value
            # is the global loss on every device; gradient is the local
            # tile's partial (psum transpose = replicated cotangent).
            loss = jax.lax.psum(loss, pixel_axis)
        log_p = -loss / b
        z_kl = -z_logstd + 0.5 * z_std ** 2 + 0.5 * z_mu ** 2 - 0.5
        kl_div = jnp.mean(kl_div + jnp.sum(z_kl, axis=1))
        if pixel_axis is not None:
            # the KL is computed REPLICATED on every pixel shard; the
            # caller psums grads over pixel_axis, so scale the KL's
            # gradient to kl/n (value unchanged: kl/n + sg(kl - kl/n))
            inv = 1.0 / jax.lax.psum(1.0, pixel_axis)
            kl_obj = kl_div * inv + jax.lax.stop_gradient(
                kl_div * (1.0 - inv))
            return log_p - kl_obj, log_p, kl_div, None
        return log_p - kl_div, log_p, kl_div, None

    # ---- decode -----------------------------------------------------------
    if ecfg.vanilla:
        y_hat = vanilla_generator_apply(p_params, p_cfg, None, z)
    elif ecfg.use_fold and can_fold(p_cfg):
        if ecfg.fused:
            from spatialvae_tpu.kernels.fused_decoder import (
                can_fuse_decoder,
                fused_spatial_generator,
            )
            if ecfg.int8:
                from spatialvae_tpu.kernels.fused_decoder_int8 import (
                    can_fuse_int8,
                    fused_spatial_generator_int8,
                )
            if ecfg.int8 and can_fuse_int8(p_cfg, coords.shape[0]):
                y_hat = fused_spatial_generator_int8(p_params, p_cfg, coords,
                                                     theta, dx, z)
            elif can_fuse_decoder(p_cfg, coords.shape[0]):
                y_hat = fused_spatial_generator(p_params, p_cfg, coords,
                                                theta, dx, z)
            else:
                y_hat = spatial_generator_apply_folded(p_params, p_cfg,
                                                       coords, theta, dx, z)
        else:
            y_hat = spatial_generator_apply_folded(p_params, p_cfg, coords,
                                                   theta, dx, z)
    else:
        x = jnp.broadcast_to(coords[None], (b,) + coords.shape)
        if theta is not None:
            x = rotate_coords(coords, theta)
        if dx is not None:
            x = translate_coords(x, dx)
        y_hat = spatial_generator_apply(p_params, p_cfg, x, z)
    # y_hat: (B, HW, n_out)

    # ---- reconstruction log-likelihood ------------------------------------
    if ecfg.likelihood == "bernoulli":
        # -BCE(mean over elements) * size == -(sum BCE)/B  (train_mnist.py:81,
        # train_galaxy.py:118-119)
        target = y.reshape(b, -1)
        if mask is not None:
            # per-pixel mask (library extension: the reference masks only
            # the gaussian path, train_particles.py:126-133) — broadcast
            # over channels if y has them
            c = target.shape[1] // mask.shape[0]
            mflat = jnp.repeat(mask, c) if c > 1 else mask
            per = _bce_elems(y_hat.reshape(b, -1), target)
            log_p = -jnp.sum(per * mflat[None, :]) / b
        else:
            log_p = -_bce_sum(y_hat.reshape(b, -1), target) / b
    else:
        y_flat = y.reshape(b, -1)
        hw = y_flat.shape[1]
        yp = y_hat.reshape(b, -1)
        if yp.shape[1] > hw:  # fit-noise: n_out == 2
            if ecfg.fit_noise_interleaved:
                y_mu = yp[:, :hw]
                y_logvar = yp[:, hw:]
            else:
                y_mu = y_hat[..., 0]
                y_logvar = y_hat[..., 1]
        else:
            y_mu = yp
            y_logvar = None

        y_var = jnp.exp(y_logvar) if y_logvar is not None else None
        if ctf is not None:
            from spatialvae_tpu.ctf.apply import apply_ctf
            n, m = image_shape
            y_mu = apply_ctf(y_mu.reshape(b, n, m), ctf).reshape(b, hw)
            if y_var is not None:
                # reference quirk kept: the variance is convolved but the
                # +logvar term below uses the *pre*-convolution y_logvar
                # (train_particles.py:110,121-124,137)
                y_var = apply_ctf(y_var.reshape(b, n, m), ctf).reshape(b, hw)

        sq = (y_mu - y_flat) ** 2
        if y_var is not None:
            per_elem = sq / y_var + y_logvar
        else:
            per_elem = sq
        if mask is not None:
            # broadcast the (HW,) mask over channels pixel-major, exactly
            # like the bernoulli branch (multi-channel gaussian data is a
            # library extension — the reference masks grayscale only)
            c = per_elem.shape[1] // mask.shape[0]
            mflat = jnp.repeat(mask, c) if c > 1 else mask
            per_elem = per_elem * mflat[None, :]
        log_p = -0.5 * jnp.mean(jnp.sum(per_elem, axis=1))
        # display/serving output is always the (CTF-corrected) predicted
        # mean — for --fit-noise models too, not the raw (B, HW, 2) head
        y_hat = y_mu.reshape(b, -1)[..., None]

    # ---- unit normal KL over translation + z ------------------------------
    z_kl = -z_logstd + 0.5 * z_std ** 2 + 0.5 * z_mu ** 2 - 0.5
    kl_div = kl_div + jnp.sum(z_kl, axis=1)
    kl_div = jnp.mean(kl_div)

    elbo = log_p - kl_div
    return elbo, log_p, kl_div, y_hat
