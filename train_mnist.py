#!/usr/bin/env python
"""Flag-compatible entry point: train spatial-VAE on MNIST datasets.

See spatialvae_tpu/cli/train_mnist.py.
"""

from spatialvae_tpu.cli.train_mnist import main

if __name__ == "__main__":
    main()
