"""spatialvae_tpu — a TPU-native JAX framework with the capabilities of
cfframe/spatial-VAE (arXiv:1909.11663).

The reference implementation (/root/reference, PyTorch) trains a VAE whose
decoder is a coordinate-conditioned MLP evaluated at every pixel, with
structured rotation/translation latents.  This package re-designs that system
TPU-first:

- pure-functional models over parameter pytrees (``spatialvae_tpu.models``)
- a single unified ELBO covering every likelihood/KL variant of the three
  reference CLIs (``spatialvae_tpu.objectives``)
- rotation/translation folded algebraically into per-image effective
  first-layer weights so the hot path is MXU GEMMs + VPU FMAs
  (``spatialvae_tpu.transforms``, ``spatialvae_tpu.kernels``)
- an epoch driver that keeps the whole dataset in HBM and runs
  ``lax.scan`` over jitted train steps — no host round-trips per step
  (``spatialvae_tpu.train``)
- multi-chip scaling over a ``jax.sharding.Mesh`` with data-parallel batch
  sharding and pixel-axis (sequence-parallel analogue) sharding
  (``spatialvae_tpu.parallel``)
- flag-compatible CLI entry points (``spatialvae_tpu.cli``)
"""

__version__ = "0.1.0"
