"""Per-image CTF application on device.

The reference applies each particle's real-space CTF kernel with a grouped
spatial conv2d — image i convolved with kernel i, zero padding kn//2
(train_particles.py:112-124).  Kernels are full-image-sized, so the spatial
conv is O(n^2 * kn^2) — on TPU we instead compute the *identical* linear
cross-correlation through zero-padded FFTs (XLA FFT), which is exact up to
fp error and O(n^2 log n).  A lax.conv fallback is kept for parity testing.

torch.conv2d semantics: cross-correlation (no kernel flip), with padding p:

    out[i, j] = sum_{u,v} y[i+u-p, j+v-p] * k[u, v]

which equals the 'same' slice (offset kn-1-p) of the full linear convolution
of y with the 180-degree-rotated kernel.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def apply_ctf(y: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """FFT path.  y: (B, n, m); kernels: (B, kn, km) -> (B, n, m)."""
    b, n, m = y.shape
    kn, km = kernels.shape[1], kernels.shape[2]
    pn, pm = kn // 2, km // 2
    ln, lm = n + kn - 1, m + km - 1

    kf = kernels[:, ::-1, ::-1]            # cross-correlation = conv(flip(k))
    fy = jnp.fft.rfft2(y, s=(ln, lm))
    fk = jnp.fft.rfft2(kf, s=(ln, lm))
    full = jnp.fft.irfft2(fy * fk, s=(ln, lm))
    oi, oj = kn - 1 - pn, km - 1 - pm
    return full[:, oi:oi + n, oj:oj + m]


def apply_ctf_spatial(y: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Grouped-conv parity path (bit-matches torch's grouped F.conv2d)."""
    b, n, m = y.shape
    lhs = y[None]                          # (1, B, n, m) — batch as channels
    rhs = kernels[:, None]                 # (B, 1, kn, km)
    pn, pm = kernels.shape[1] // 2, kernels.shape[2] // 2
    out = lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(1, 1),
        padding=((pn, pn), (pm, pm)),
        feature_group_count=b,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0]
