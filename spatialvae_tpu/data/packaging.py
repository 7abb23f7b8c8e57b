"""Image-directory -> .npy packaging (host-side).

Capability parity with /root/reference/src/file_tools.py:213-268: collect
``*.jpg`` (or other suffix) files from one directory, optionally resize, and
save a stacked ``.npy``.  Resizing uses PIL bilinear (the reference uses
skimage.transform.resize, which is not in this image); outputs are int
arrays either way.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


def create_numpy_archive_from_images_dir(src_dir: str, target_path: str,
                                         new_shape=0,
                                         suffix: str = ".jpg") -> str:
    if new_shape is None:
        new_shape = 0
    if suffix is None:
        suffix = ".jpg"

    if src_dir == "":
        return "No source directory supplied for images, so no npy file created."
    if not Path(src_dir).is_dir():
        return f'"{src_dir}" is not a directory, so no npy file created.'

    files = sorted(
        os.path.join(src_dir, f) for f in os.listdir(src_dir)
        if os.path.isfile(os.path.join(src_dir, f))
        and Path(f).suffix == suffix)
    if not files:
        return f"No {suffix} files at {src_dir} so no npy file created."

    from PIL import Image

    stack = []
    for path in files:
        img = Image.open(path)
        if new_shape != 0:
            # PIL size is (width, height); new_shape is (rows, cols)
            img = img.resize((new_shape[1], new_shape[0]),
                             resample=Image.BILINEAR)
        stack.append(np.asarray(img, dtype="int"))
    final_path = target_path + ".npy"
    np.save(final_path, np.stack(stack))
    return f"Npy file saved at {final_path}"
