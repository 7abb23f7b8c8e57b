#!/usr/bin/env python
"""Flag-compatible entry point: train spatial-VAE on particle datasets.

See spatialvae_tpu/cli/train_particles.py.
"""

from spatialvae_tpu.cli.train_particles import main

if __name__ == "__main__":
    main()
