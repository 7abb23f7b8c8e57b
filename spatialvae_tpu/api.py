"""High-level library API for trained spatial-VAE models.

The reference offers no inference API (checkpoints are whole-module torch
pickles that are never loaded back — SURVEY.md section 3.5).  This module is
the additive serving surface: load a checkpoint pair and encode / decode /
reconstruct batches with jitted functions.

    model = SpatialVae.load("run_generator_epoch100.sav",
                            "run_inference_epoch100.sav", image_shape=(64, 64))
    z_mu, z_logstd = model.encode(images)
    recon = model.reconstruct(images, key)          # posterior sample
    canon = model.reconstruct_canonical(images, key)  # pose-stripped
    samples = model.sample(16, key)                  # prior samples
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from spatialvae_tpu.core.config import (
    InferenceConfig,
    VanillaGeneratorConfig,
)
from spatialvae_tpu.models import (
    inference_apply,
    spatial_generator_apply,
    vanilla_generator_apply,
)
from spatialvae_tpu.train.checkpoint import load_model_meta
from spatialvae_tpu.transforms.coords import coord_grid


@dataclass
class SpatialVae:
    q_params: dict
    p_params: dict
    q_cfg: InferenceConfig
    p_cfg: object
    coords: jnp.ndarray
    image_shape: Tuple[int, int]
    ecfg: object = None          # ElboConfig persisted at training time

    @property
    def vanilla(self) -> bool:
        return isinstance(self.p_cfg, VanillaGeneratorConfig)

    @property
    def pose_dims(self) -> int:
        """Latent slots used by rotation (1) + translation (2)."""
        if self.ecfg is not None and not self.vanilla:
            return int(self.ecfg.rotate) + 2 * int(self.ecfg.translate)
        z = getattr(self.p_cfg, "latent_dim", 0)
        return self.q_cfg.latent_dim - z

    @staticmethod
    def load(generator_path: str, inference_path: str,
             image_shape: Tuple[int, int] | None = None) -> "SpatialVae":
        """image_shape may be omitted when the checkpoint persisted it
        (checkpoints written from round 2 on carry the training semantics:
        ELBO/pose config + image shape).

        Also accepts checkpoints written by the REFERENCE (torch
        whole-module .sav pickles, misc_tools.py:88-104) — the format is
        auto-detected and converted (io/torch_import.py).  Those never
        persisted the image shape, so pass image_shape explicitly."""
        p_params, p_cfg, kind, meta = load_model_meta(generator_path)
        assert kind == "generator", generator_path
        q_params, q_cfg, kind, _ = load_model_meta(inference_path)
        assert kind == "inference", inference_path
        if image_shape is None:
            image_shape = meta.get("image_shape")
            if image_shape is None:
                raise ValueError(
                    f"{generator_path} predates image-shape persistence; "
                    "pass image_shape=(n, m) explicitly")
        n, m = image_shape
        return SpatialVae(q_params=q_params, p_params=p_params, q_cfg=q_cfg,
                          p_cfg=p_cfg, coords=jnp.asarray(coord_grid(n, m)),
                          image_shape=tuple(image_shape),
                          ecfg=meta.get("elbo"))

    # ------------------------------------------------------------- inference
    def encode(self, y: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """y: (B, HW[, C]) in [0,1] -> (z_mu, z_logstd) incl. pose slots."""
        b = y.shape[0]
        return _encode(self.q_params, self.q_cfg, y.reshape(b, -1))

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """z: (B, z_dim) content latents -> (B, HW, n_out)."""
        if self.vanilla:
            return vanilla_generator_apply(self.p_params, self.p_cfg, None, z)
        return _decode(self.p_params, self.p_cfg, self.coords, z)

    def sample(self, num: int, key: jax.Array) -> jnp.ndarray:
        """Prior samples z ~ N(0, I) decoded over the canonical grid."""
        z = jax.random.normal(key, (num, self.p_cfg.latent_dim))
        return self.decode(z)

    def reconstruct(self, y: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """Posterior-sample reconstruction including the inferred pose.

        Uses the ELBO/pose config persisted in the checkpoint (dx_scale,
        theta_prior, rotate/translate, likelihood, channels, softplus), so a
        model trained with e.g. --dx-scale 0.5 reconstructs its translations
        at the trained scale.  Falls back to a latent-layout heuristic for
        pre-r2 checkpoints."""
        import dataclasses

        from spatialvae_tpu.objectives import ElboConfig, elbo_minibatch

        if self.ecfg is not None:
            # serving always decodes through the XLA path
            ecfg = dataclasses.replace(self.ecfg, fused=False, int8=False)
        else:
            pose = self.pose_dims
            ecfg = ElboConfig(rotate=pose >= 1, translate=pose >= 2,
                              vanilla=self.vanilla)
        _, _, _, y_hat = elbo_minibatch(
            self.q_params, self.p_params, self.q_cfg, self.p_cfg, ecfg,
            self.coords, y, key, image_shape=self.image_shape,
            want_y_hat=True)
        return y_hat

    def reconstruct_canonical(self, y: jnp.ndarray, key: jax.Array
                              ) -> jnp.ndarray:
        """Pose-stripped reconstruction (rotation/translation removed)."""
        z_mu, z_logstd = self.encode(y)
        r = jax.random.normal(key, z_mu.shape, z_mu.dtype)
        z = jnp.exp(z_logstd) * r + z_mu
        z = z[:, self.pose_dims:]
        return self.decode(z)


@partial(jax.jit, static_argnums=1)
def _encode(q_params, q_cfg, y):
    return inference_apply(q_params, q_cfg, y)


@partial(jax.jit, static_argnums=1)
def _decode(p_params, p_cfg, coords, z):
    x = jnp.broadcast_to(coords[None], (z.shape[0],) + coords.shape)
    return spatial_generator_apply(p_params, p_cfg, x, z)
