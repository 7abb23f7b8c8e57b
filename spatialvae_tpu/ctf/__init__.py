from spatialvae_tpu.ctf.physics import compute_2d_ctf, ctf_filter, parse_ctf
from spatialvae_tpu.ctf.apply import apply_ctf, apply_ctf_spatial

__all__ = [
    "compute_2d_ctf",
    "ctf_filter",
    "parse_ctf",
    "apply_ctf",
    "apply_ctf_spatial",
]
