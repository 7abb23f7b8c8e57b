"""VanillaGenerator — baseline MLP decoder z -> all pixels at once.

Capability parity with /root/reference/spatial_vae/models.py:135-172.
Ignores coordinates; disables structured rotation/translation inference.

Quirk replicated for parity (models.py:156-157 + 169-170): when
``softplus=True`` the reference appends an ``nn.Softplus`` layer *and*
re-applies ``F.softplus`` to channel 0 in forward — channel 0 therefore gets
softplus twice while the other channels get it once.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from spatialvae_tpu.core.config import VanillaGeneratorConfig
from spatialvae_tpu.nn import mlp_apply, mlp_init, resolve_activation


def vanilla_generator_init(key: jax.Array, cfg: VanillaGeneratorConfig,
                           dtype=jnp.float32):
    dims = ([cfg.latent_dim] + [cfg.hidden_dim] * cfg.num_layers
            + [cfg.n * cfg.n_out])
    return {"layers": mlp_init(key, dims, resid_hidden=cfg.resid, dtype=dtype)}


def vanilla_generator_apply(params, cfg: VanillaGeneratorConfig,
                            x: Optional[jax.Array], z: jax.Array) -> jax.Array:
    """z: (B, latent_dim) -> (B, n, n_out).  x is accepted and ignored."""
    del x
    act = resolve_activation(cfg.activation)
    y = mlp_apply(params["layers"], z, act, resid_hidden=cfg.resid,
                  final_act=jax.nn.sigmoid)
    if cfg.softplus:
        y = jax.nn.softplus(y)                        # the appended layer
    y = y.reshape(z.shape[0], -1, cfg.n_out)
    if cfg.softplus:                                  # double softplus on ch 0
        y = jnp.concatenate(
            [jax.nn.softplus(y[..., :1]), y[..., 1:]], axis=-1)
    return y
