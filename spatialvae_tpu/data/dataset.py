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
    """y: (N, ...) images; ctf: optional (N, kn, km) per-image CTF kernels."""

    y: jax.Array
    ctf: Optional[jax.Array] = None

    def __len__(self) -> int:
        return self.y.shape[0]

    @staticmethod
    def from_numpy(y: np.ndarray, ctf: Optional[np.ndarray] = None,
                   device=None, sharding=None) -> "ArrayDataset":
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
    iterators, train_mnist.py:396).
    """
    perm = None if key is None else jax.random.permutation(key, n)
    num_full = n // batch_size
    tail = n - num_full * batch_size
    return perm, num_full, tail


def gather_batches(data: jax.Array, perm: Optional[jax.Array], num_full: int,
                   batch_size: int) -> jax.Array:
    """Stack the full batches as (num_full, batch_size, ...) for lax.scan."""
    take = num_full * batch_size
    sel = data[perm[:take]] if perm is not None else data[:take]
    return sel.reshape((num_full, batch_size) + data.shape[1:])


def tail_batch(data: jax.Array, perm: Optional[jax.Array], num_full: int,
               batch_size: int, tail: int) -> Optional[jax.Array]:
    if tail == 0:
        return None
    start = num_full * batch_size
    if perm is not None:
        return data[perm[start:start + tail]]
    return data[start:start + tail]
