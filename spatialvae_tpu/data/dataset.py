"""In-HBM dataset + permutation batcher.

Replaces the reference's ``TensorDataset`` + ``DataLoader(shuffle=True)``
(train_mnist.py:334,395-396) with the TPU-native pattern: the whole dataset
lives in device memory as one array (the reference preloads to GPU the same
way, train_particles.py:405-413); each epoch draws a fresh
``jax.random.permutation`` and the epoch driver ``lax.scan``s over
equal-sized batch slices.  The trailing partial batch (DataLoader keeps it)
is handled by the driver with a separately-jitted tail step so every shape
stays static.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class ArrayDataset:
    """y: (N, ...) images; ctf: optional (N, kn, km) per-image CTF kernels.

    When ``host_resident`` the arrays stay numpy on the host and the epoch
    driver streams one minibatch per step to the device instead of scanning
    over an in-HBM dataset (the reference's --no-preload,
    train_particles.py:405-413) — for stacks larger than device memory.
    """

    y: jax.Array
    ctf: Optional[jax.Array] = None
    host_resident: bool = False

    def __len__(self) -> int:
        return self.y.shape[0]

    @staticmethod
    def from_numpy(y: np.ndarray, ctf: Optional[np.ndarray] = None,
                   device=None, sharding=None,
                   preload: bool = True) -> "ArrayDataset":
        if not preload:
            return ArrayDataset(y=np.asarray(y),
                                ctf=None if ctf is None else np.asarray(ctf),
                                host_resident=True)
        put = (lambda a: jax.device_put(a, sharding or device))
        return ArrayDataset(
            y=put(jnp.asarray(y)),
            ctf=None if ctf is None else put(jnp.asarray(ctf)),
        )


def epoch_batches(key: Optional[jax.Array], n: int, batch_size: int
                  ) -> Tuple[Optional[jax.Array], int, int]:
    """Per-epoch permutation plan.

    Returns (perm, num_full_batches, tail_size).  perm is None when key is
    None (evaluation order is sequential, DataLoader default for val
    iterators, train_mnist.py:396).  The trainer scans over index batches
    drawn from perm; the per-step gather happens on device inside the scan
    body, so the permuted dataset copy never materialises.
    """
    perm = None if key is None else jax.random.permutation(key, n)
    num_full = n // batch_size
    tail = n - num_full * batch_size
    return perm, num_full, tail
