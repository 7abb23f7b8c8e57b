from spatialvae_tpu.transforms.coords import coord_grid, rotate_coords, translate_coords
from spatialvae_tpu.transforms.augment import rotate_images_bicubic

__all__ = [
    "coord_grid",
    "rotate_coords",
    "translate_coords",
    "rotate_images_bicubic",
]
