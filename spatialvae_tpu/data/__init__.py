from spatialvae_tpu.data.dataset import ArrayDataset, epoch_batches

__all__ = ["ArrayDataset", "epoch_batches"]
