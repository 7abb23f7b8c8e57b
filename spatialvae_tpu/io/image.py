"""Fourier-domain image ops (host-side preprocessing).

Capability parity with /root/reference/spatial_vae/image.py:6-63:
- ``downsample``: rfft2 -> keep the low-frequency corners -> scale by the
  area ratio -> irfft2
- ``crop``: center crop
- ``normalize``: per-image (x - mu)/sigma where the statistics come from the
  background annulus (pixels at distance >= radius from center); the
  trainers' ``--normalize`` uses whole-image statistics instead
  (train_particles.py:339-351) — both variants are provided.
"""

from __future__ import annotations

import numpy as np


def downsample(x: np.ndarray, factor: float = 1,
               shape: tuple | None = None) -> np.ndarray:
    """Fourier-crop a (..., n, m) stack to ``shape`` (or by ``factor``)."""
    if shape is None:
        m, n = x.shape[-2:]
        shape = (int(m / factor), int(n / factor))

    spectrum = np.fft.rfft2(x)
    m, n = shape
    top = spectrum[..., 0:m // 2, 0:n // 2 + 1]
    bottom = spectrum[..., -m // 2:, 0:n // 2 + 1]
    spectrum = np.concatenate([top, bottom], axis=-2)
    # energy rescaling so pixel values keep their magnitude
    spectrum *= (n * m) / (x.shape[-2] * x.shape[-1])
    out = np.fft.irfft2(spectrum, s=shape)
    return out.astype(x.dtype)


def crop(stack: np.ndarray, size: int) -> np.ndarray:
    """Center-crop the trailing two dims to (size, size)."""
    n, m = stack.shape[-2:]
    si = (n - size) // 2
    sj = (m - size) // 2
    return stack[..., si:si + size, sj:sj + size]


def normalize(stack: np.ndarray, radius: float | None = None) -> np.ndarray:
    """Per-image standardisation using background-annulus statistics."""
    n, m = stack.shape[-2:]
    if radius is None:
        radius = min(n, m) / 2
    yy, xx = np.ogrid[:n, :m]
    dist = np.sqrt((n / 2 - yy) ** 2 + (m / 2 - xx) ** 2)
    annulus = dist >= radius

    out = np.zeros_like(stack)
    for i in range(stack.shape[0]):
        bg = stack[i][annulus]
        out[i] = (stack[i] - bg.mean()) / bg.std()
    return out


def normalize_whole(stack: np.ndarray) -> np.ndarray:
    """Per-image whole-image standardisation — the variant the particles
    trainer actually uses (train_particles.py:339-347).

    Uses the native multithreaded kernel when built
    (spatialvae_tpu/native), numpy otherwise."""
    from spatialvae_tpu import native

    out = np.ascontiguousarray(stack, dtype=np.float32).copy()
    if native.normalize_whole_inplace(out):
        return out
    flat = stack.reshape(stack.shape[0], -1)
    mu = flat.mean(axis=1)[:, None, None]
    std = flat.std(axis=1)[:, None, None]
    return (stack - mu) / std
