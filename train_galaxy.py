#!/usr/bin/env python
"""Flag-compatible entry point: train spatial-VAE on galaxy datasets.

See spatialvae_tpu/cli/train_galaxy.py.
"""

from spatialvae_tpu.cli.train_galaxy import main

if __name__ == "__main__":
    main()
