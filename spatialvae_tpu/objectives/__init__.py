from spatialvae_tpu.objectives.elbo import ElboConfig, elbo_minibatch

__all__ = ["ElboConfig", "elbo_minibatch"]
