from spatialvae_tpu.io.mrc import MrcHeader, read_mrc, parse_mrc, write_mrc
from spatialvae_tpu.io.image import downsample, crop, normalize
from spatialvae_tpu.io.loaders import load_images
from spatialvae_tpu.io.png import save_image_grid

__all__ = [
    "MrcHeader",
    "read_mrc",
    "parse_mrc",
    "write_mrc",
    "downsample",
    "crop",
    "normalize",
    "load_images",
    "save_image_grid",
]
