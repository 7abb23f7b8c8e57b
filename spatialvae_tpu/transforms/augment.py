"""Device-side rotation augmentation.

The reference augments by rotating each observed image with PIL BICUBIC on
the host, inside the minibatch loop (train_particles.py:31-43,
train_galaxy.py:47-54) — a per-image device->host->device round trip.  Here
the same augmentation runs on device as a batched affine bicubic resample
(vmapped gather + cubic convolution kernel), so it fuses into the jitted
train step.

Semantics matched to ``PIL.Image.rotate(angle_degrees, resample=BICUBIC)``:
rotation about the image center (w/2, h/2), output the same size,
out-of-bounds filled with 0, cubic convolution kernel with a = -0.5.
The inferred theta offset re-injection (theta + offset before building the
pose) is handled by the caller, exactly as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cubic_weights(t: jnp.ndarray):
    """Cubic convolution weights, a=-1.0 (PIL's affine-transform BICUBIC).

    PIL's resize BICUBIC uses a=-0.5, but rotate() goes through the affine
    transform path whose cubic kernel uses a=-1.0 — verified against PIL by
    probing a fractional translation of a delta image.

    t in [0,1) is the fractional offset; returns weights for samples at
    offsets (-1, 0, 1, 2) relative to the base index.
    """
    a = -1.0

    def k1(x):   # |x| <= 1
        return (a + 2.0) * x ** 3 - (a + 3.0) * x ** 2 + 1.0

    def k2(x):   # 1 < |x| < 2
        return a * x ** 3 - 5.0 * a * x ** 2 + 8.0 * a * x - 4.0 * a

    return (k2(t + 1.0), k1(t), k1(1.0 - t), k2(2.0 - t))


def _sample_bicubic(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray
                    ) -> jnp.ndarray:
    """Sample img (n, m) or (n, m, C) at continuous positions.

    xs/ys are in pixel-center convention: position (x, y) with x in [0, m),
    the center of pixel (row r, col c) being (c + 0.5, r + 0.5).  Out-of-
    bounds contributions are zero (PIL fill behaviour).
    """
    n, m = img.shape[0], img.shape[1]
    has_c = img.ndim == 3
    flat = img.reshape(n * m, -1)                     # (n*m, C or 1)

    fx = xs - 0.5
    fy = ys - 0.5
    bx = jnp.floor(fx)
    by = jnp.floor(fy)
    tx = fx - bx
    ty = fy - by
    bx = bx.astype(jnp.int32)
    by = by.astype(jnp.int32)

    wxs = _cubic_weights(tx)                          # 4 x (...,)
    wys = _cubic_weights(ty)

    out = jnp.zeros(xs.shape + (flat.shape[-1],), dtype=img.dtype)
    for dy in range(-1, 3):
        ry = by + dy
        vy = (ry >= 0) & (ry < n)
        ryc = jnp.clip(ry, 0, n - 1)
        wy = wys[dy + 1] * vy
        for dx in range(-1, 3):
            rx = bx + dx
            vx = (rx >= 0) & (rx < m)
            rxc = jnp.clip(rx, 0, m - 1)
            w = (wxs[dx + 1] * vx * wy)[..., None]
            out = out + w * flat[ryc * m + rxc]
    return out if has_c else out[..., 0]


def rotate_images_bicubic(images: jnp.ndarray, theta: jnp.ndarray
                          ) -> jnp.ndarray:
    """Rotate a batch of images CCW by theta (radians) about their centers.

    images: (B, n, m) or (B, n, m, C); theta: (B,).  Matches
    ``PIL.Image.rotate(degrees(theta), resample=BICUBIC)``.
    """
    n, m = images.shape[1], images.shape[2]
    cx, cy = m / 2.0, n / 2.0
    # output pixel centers
    ys, xs = jnp.meshgrid(jnp.arange(n, dtype=images.dtype) + 0.5,
                          jnp.arange(m, dtype=images.dtype) + 0.5,
                          indexing="ij")

    def one(img, t):
        # PIL's inverse mapping for rotate(t CCW) in y-down image coords
        # (verified against PIL.Image.rotate):
        #   x_in = cos(t)*(x-cx) - sin(t)*(y-cy) + cx
        #   y_in = sin(t)*(x-cx) + cos(t)*(y-cy) + cy
        c, s = jnp.cos(t), jnp.sin(t)
        xo = xs - cx
        yo = ys - cy
        xin = c * xo - s * yo + cx
        yin = s * xo + c * yo + cy
        return _sample_bicubic(img, xin, yin)

    return jax.vmap(one)(images, theta)
