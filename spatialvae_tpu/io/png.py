"""PNG image-grid writer.

Reproduces the geometry of the reference's dump path —
``torchvision.utils.save_image(images, nrow=floor(sqrt(B)), padding=3,
pad_value=0.5)`` via MiscTools.export_batch_as_image
(/root/reference/src/misc_tools.py:31-39) — in numpy + PIL, so PNG grids
from both frameworks are pixel-identical:

- grid cells row-major, ``xmaps = min(nrow, B)`` columns,
  ``ymaps = ceil(B / xmaps)`` rows
- ``padding``-pixel border around every cell, fill value ``pad_value``
- quantisation ``uint8 = clamp(round down of x*255 + 0.5, 0, 255)``
"""

from __future__ import annotations

import math
import os

import numpy as np


def save_image_grid(data: np.ndarray, output: str, image_dims,
                    nrow: int | None = None, padding: int = 3,
                    pad_value: float = 0.5) -> None:
    """data: (B, HW*C) or (B, HW, C); image_dims: (n, m)."""
    data = np.asarray(data, dtype=np.float32)
    b = data.shape[0]
    n, m = image_dims
    imgs = data.reshape(b, n, m, -1)                  # (B, n, m, C)
    c = imgs.shape[-1]

    if nrow is None:
        nrow = int(b ** 0.5)                          # misc_tools.py:38
    xmaps = min(nrow, b)
    ymaps = int(math.ceil(b / xmaps))

    from spatialvae_tpu import native

    out8 = native.grid_tile(imgs, xmaps, ymaps, padding, pad_value)
    if out8 is None:                                  # pure-Python fallback
        cell_h, cell_w = n + padding, m + padding
        grid = np.full(
            (cell_h * ymaps + padding, cell_w * xmaps + padding, c),
            pad_value, dtype=np.float32)
        k = 0
        for gy in range(ymaps):
            for gx in range(xmaps):
                if k >= b:
                    break
                top = gy * cell_h + padding
                left = gx * cell_w + padding
                grid[top:top + n, left:left + m] = imgs[k]
                k += 1
        # torchvision quantisation: mul(255).add_(0.5).clamp_(0,255).byte()
        out8 = np.clip(grid * 255.0 + 0.5, 0, 255).astype(np.uint8)

    os.makedirs(os.path.dirname(output) or ".", exist_ok=True)
    from PIL import Image

    if c == 1:
        Image.fromarray(out8[..., 0], mode="L").save(output)
    else:
        Image.fromarray(out8, mode="RGB").save(output)
