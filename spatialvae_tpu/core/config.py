"""Static model configuration dataclasses.

These are hashable/frozen so they can be closed over by ``jax.jit`` as static
structure.  They mirror the constructor signatures of the three reference
networks (/root/reference/spatial_vae/models.py:24-137) but hold no tensors —
parameters live in separate pytrees.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class InferenceConfig:
    """q(z|y): flat image -> (z_mu, z_logstd).  models.py:24-54."""

    n: int                      # input size = pixels * channels
    latent_dim: int             # inf_dim = z + rotate + 2*translate
    hidden_dim: int = 500
    num_layers: int = 1
    activation: str = "tanh"
    resid: bool = False


@dataclass(frozen=True)
class SpatialGeneratorConfig:
    """p(y|x,z): per-coordinate MLP decoder.  models.py:57-132."""

    latent_dim: int
    hidden_dim: int = 500
    n_out: int = 1
    num_layers: int = 1
    activation: str = "tanh"
    softplus: bool = False
    resid: bool = False
    expand_coords: bool = False
    bilinear: bool = False

    @property
    def in_dim(self) -> int:
        # expand_coords appends x^2, y^2, x*y (models.py:65-67,99-102)
        return 5 if self.expand_coords else 2


@dataclass(frozen=True)
class VanillaGeneratorConfig:
    """Standard MLP decoder z -> all pixels at once.  models.py:135-172."""

    n: int                      # number of pixels
    latent_dim: int
    hidden_dim: int = 500
    n_out: int = 1
    num_layers: int = 1
    activation: str = "tanh"
    softplus: bool = False
    resid: bool = False


def config_to_dict(cfg) -> dict:
    d = dataclasses.asdict(cfg)
    d["__class__"] = type(cfg).__name__
    return d


def config_from_dict(d: dict):
    d = dict(d)
    name = d.pop("__class__")
    if name == "ElboConfig":
        # lazy import: objectives depends on core.config
        from spatialvae_tpu.objectives import ElboConfig
        known = {f.name for f in dataclasses.fields(ElboConfig)}
        return ElboConfig(**{k: v for k, v in d.items() if k in known})
    cls = {
        "InferenceConfig": InferenceConfig,
        "SpatialGeneratorConfig": SpatialGeneratorConfig,
        "VanillaGeneratorConfig": VanillaGeneratorConfig,
    }[name]
    return cls(**d)
