from spatialvae_tpu.kernels.fused_decoder import (
    can_fuse_decoder,
    fused_decoder_tail,
)

__all__ = ["can_fuse_decoder", "fused_decoder_tail"]
