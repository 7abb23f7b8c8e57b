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

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class FusedAdamState(NamedTuple):
    count: jnp.ndarray
    mu: dict
    nu: dict


def fused_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p)
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
            # accept mixed-precision grads directly: the upcast fuses into
            # this single elementwise pass instead of materialising an f32
            # copy of the gradient tree
            g = g.astype(m.dtype)
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * (g * g)
            update = -learning_rate * (m / c1) / (jnp.sqrt(v / c2) + eps)
            return update, m, v

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        out = [leaf(g, m, v) for g, m, v in zip(flat_g, flat_m, flat_v)]
        updates = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return updates, FusedAdamState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)
