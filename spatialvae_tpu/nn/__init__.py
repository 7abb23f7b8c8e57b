from spatialvae_tpu.nn.layers import (
    ACTIVATIONS,
    bilinear_apply,
    bilinear_init,
    linear_apply,
    linear_init,
    mlp_apply,
    mlp_init,
    resolve_activation,
)

__all__ = [
    "ACTIVATIONS",
    "bilinear_apply",
    "bilinear_init",
    "linear_apply",
    "linear_init",
    "mlp_apply",
    "mlp_init",
    "resolve_activation",
]
