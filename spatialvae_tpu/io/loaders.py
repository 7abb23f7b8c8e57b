"""Image stack loading dispatch.

Parity with /root/reference/train_particles.py:248-255: ``.mrc``/``.mrcs``
via the MRC codec, ``.npy`` via numpy.
"""

from __future__ import annotations

import numpy as np

from spatialvae_tpu.io.mrc import read_mrc


def load_images(path: str) -> np.ndarray:
    if path.endswith(("mrc", "mrcs")):
        array, _, _ = read_mrc(path)
        return array
    if path.endswith("npy"):
        return np.load(path)
    raise ValueError(f"unsupported image stack format: {path}")
