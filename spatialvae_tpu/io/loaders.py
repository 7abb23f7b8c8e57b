"""Image stack loading dispatch.

Parity with /root/reference/train_particles.py:248-255: ``.mrc``/``.mrcs``
via the MRC codec, ``.npy`` via numpy.
"""

from __future__ import annotations

import numpy as np

from spatialvae_tpu.io.mrc import MrcHeader


def load_images(path: str) -> np.ndarray:
    if path.endswith(("mrc", "mrcs")):
        return _load_mrc_fast(path)
    if path.endswith("npy"):
        return np.load(path)
    raise ValueError(f"unsupported image stack format: {path}")


def _load_mrc_fast(path: str) -> np.ndarray:
    """MRC stack load with the native multithreaded float32 decoder when
    built; falls back to the pure-Python codec."""
    from spatialvae_tpu import native

    with open(path, "rb") as f:
        content = f.read()
    header = MrcHeader.unpack(content)
    if header.mode in (0, 1, 2, 6) and native.available():
        count = header.nz * header.ny * header.nx
        out = native.mrc_decode_f32(content[1024 + header.next:], count,
                                    header.mode)
        if out is not None:
            out = out.reshape(header.nz, header.ny, header.nx)
            return out[0] if header.nz == 1 else out
    from spatialvae_tpu.io.mrc import parse_mrc

    array, _, _ = parse_mrc(content)
    return array
