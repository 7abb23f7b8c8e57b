#!/usr/bin/env python
"""Flag-compatible entry point: images directory -> numpy archive.

See spatialvae_tpu/cli/numpy_array_from_images.py.
"""

from spatialvae_tpu.cli.numpy_array_from_images import main

if __name__ == "__main__":
    main()
