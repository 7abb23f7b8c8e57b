#!/usr/bin/env python
"""Flag-compatible entry point: download + package a dataset.

See spatialvae_tpu/cli/get_dataset.py.
"""

from spatialvae_tpu.cli.get_dataset import main

if __name__ == "__main__":
    main()
