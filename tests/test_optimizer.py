"""fused_adam must match optax.adam (and therefore torch.optim.Adam,
see tests/test_torch_parity.py) step for step."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from spatialvae_tpu.train.optimizer import fused_adam


def test_fused_adam_matches_optax():
    key = jax.random.PRNGKey(0)
    params = {
        "a": jax.random.normal(key, (37, 11)),
        "b": {"w": jax.random.normal(key, (5,)), "c": jnp.ones((2, 2))},
    }
    ref = optax.adam(3e-3)
    fast = fused_adam(3e-3)
    s_ref = ref.init(params)
    s_fast = fast.init(params)

    p_ref = p_fast = params
    for i in range(7):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.sin(p * (i + 1)), p_ref)
        u1, s_ref = ref.update(grads, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u1)

        grads2 = jax.tree_util.tree_map(
            lambda p: jnp.sin(p * (i + 1)), p_fast)
        u2, s_fast = fast.update(grads2, s_fast, p_fast)
        p_fast = optax.apply_updates(p_fast, u2)

    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_fast)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)
