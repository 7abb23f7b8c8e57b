"""Adam, hand-fused into one elementwise pass per parameter leaf.

Semantics identical to torch.optim.Adam / optax.adam (b1=0.9, b2=0.999,
eps=1e-8 added outside the sqrt, bias correction) — the reference uses
torch's defaults (train_mnist.py:392).  optax's chained transforms
materialise an intermediate `updates` tree; this implementation computes
m/v/param updates in a single tree_map so XLA emits one fused loop per leaf,
saving one full read+write of the parameter-sized update tree per step
(~0.7 GB/step at galaxy scale).

Drop-in optax.GradientTransformation; equality with optax.adam is tested to
bitwise-level tolerance in tests/test_optimizer.py.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class FusedAdamState(NamedTuple):
    count: jnp.ndarray
    mu: dict
    nu: dict


def moments_dtype():
    """Storage dtype for the Adam moments (SPATIALVAE_ADAM_MOMENTS).

    'bf16' stores mu/nu in bfloat16 — the moment trees are the largest
    optimizer-state traffic (2 reads + 2 writes of a parameter-sized
    array per step), so halving their width targets the measured ~4.4 ms
    HBM-floor Adam pass (BASELINE.md round-3 step anatomy).  Arithmetic
    stays f32 (the EMAs are computed on upcast values and rounded once
    on store), so the knob adds ~2^-8 relative storage noise per step —
    a QUALITY lever gated by tools/int8_horizon.py like the int4 levers."""
    return (jnp.bfloat16 if os.environ.get("SPATIALVAE_ADAM_MOMENTS")
            == "bf16" else jnp.float32)


def adam_leaf(g, m, v, c1, c2, learning_rate, b1, b2, eps):
    """One fused-Adam leaf: (update, m', v').

    THE single definition of the Adam numerics (torch/optax equality is
    tested against this): accept mixed-precision grads directly — the
    upcast fuses into this single elementwise pass instead of
    materialising an f32 copy of the gradient tree; f32 moments take
    exactly the round-1 ops (bit-identical); bf16 moments upcast, compute
    in f32 and round once on store.  optimizer_pallas's XLA branch reuses
    this so the op sequence cannot drift between the two engines."""
    mdt = m.dtype
    g = g.astype(jnp.float32)
    m = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
    v = b2 * v.astype(jnp.float32) + (1.0 - b2) * (g * g)
    update = -learning_rate * (m / c1) / (jnp.sqrt(v / c2) + eps)
    return update, m.astype(mdt), v.astype(mdt)


def fused_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8) -> optax.GradientTransformation:
    def init_fn(params):
        mdt = moments_dtype()
        zeros = lambda p: jnp.zeros_like(p, dtype=mdt)
        return FusedAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update_fn(grads, state, params=None):
        del params
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def leaf(g, m, v):
            return adam_leaf(g, m, v, c1, c2, learning_rate, b1, b2, eps)

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        out = [leaf(g, m, v) for g, m, v in zip(flat_g, flat_m, flat_v)]
        updates = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return updates, FusedAdamState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)
