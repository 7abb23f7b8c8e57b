from spatialvae_tpu.models.inference import inference_apply, inference_init
from spatialvae_tpu.models.spatial import (
    spatial_generator_apply,
    spatial_generator_init,
)
from spatialvae_tpu.models.vanilla import (
    vanilla_generator_apply,
    vanilla_generator_init,
)
from spatialvae_tpu.models.reprs import torch_style_repr

__all__ = [
    "inference_apply",
    "inference_init",
    "spatial_generator_apply",
    "spatial_generator_init",
    "vanilla_generator_apply",
    "vanilla_generator_init",
    "torch_style_repr",
]
