from spatialvae_tpu.train.trainer import Trainer, TrainConfig

__all__ = ["Trainer", "TrainConfig"]
