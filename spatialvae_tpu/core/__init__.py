from spatialvae_tpu.core.config import (
    InferenceConfig,
    SpatialGeneratorConfig,
    VanillaGeneratorConfig,
)

__all__ = [
    "InferenceConfig",
    "SpatialGeneratorConfig",
    "VanillaGeneratorConfig",
]
