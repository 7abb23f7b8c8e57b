"""Primitive layers as pure functions over parameter pytrees.

Initialisation matches PyTorch ``nn.Linear`` defaults (the reference's models
are built from ``nn.Linear``/``nn.Bilinear``, /root/reference/spatial_vae/
models.py:13-87) so that ELBO trajectories are comparable:

- ``nn.Linear``: weight and bias both ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
- ``nn.Bilinear``: weight ~ U(-1/sqrt(in1), 1/sqrt(in1)).

Weights are stored transposed relative to torch — shape (fan_in, fan_out) —
so the forward pass is a plain ``x @ w`` that XLA tiles straight onto the MXU
without a relayout.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

# The reference maps CLI names to torch modules per-trainer:
#   train_mnist.py:344-348      tanh -> Tanh, relu -> LeakyReLU
#   train_particles.py:433-436  tanh -> Tanh, relu -> LeakyReLU
#   train_galaxy.py:426-434     tanh -> Tanh, relu -> ReLU, sigmoid -> Sigmoid,
#                               and the 'leakyrelu' choice is unreachable due
#                               to a 'leakrelu' typo in the dispatch (falls
#                               through to Tanh).
# ACTIVATIONS holds the raw elementwise functions; each CLI resolves its own
# name->function mapping via `resolve_activation`.
ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "sigmoid": jax.nn.sigmoid,
}


def resolve_activation(name: str):
    """Resolve an activation function by canonical name."""
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise ValueError(
            f"unknown activation {name!r}; expected one of {sorted(ACTIVATIONS)}"
        ) from None


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------


def linear_init(key: jax.Array, n_in: int, n_out: int, bias: bool = True,
                dtype=jnp.float32) -> Params:
    """Initialise a dense layer the way torch ``nn.Linear`` does."""
    bound = 1.0 / math.sqrt(n_in)
    wkey, bkey = jax.random.split(key)
    params: Params = {
        "w": jax.random.uniform(wkey, (n_in, n_out), dtype, -bound, bound)
    }
    if bias:
        params["b"] = jax.random.uniform(bkey, (n_out,), dtype, -bound, bound)
    return params


def linear_apply(params: Params, x: jax.Array) -> jax.Array:
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


# ---------------------------------------------------------------------------
# bilinear
# ---------------------------------------------------------------------------


def bilinear_init(key: jax.Array, n_in1: int, n_in2: int, n_out: int,
                  dtype=jnp.float32) -> Params:
    """Initialise like torch ``nn.Bilinear`` (bias-free variant).

    Stored as (n_in1, n_in2, n_out) so the contraction below needs no
    transpose.  Reference usage: SpatialGenerator's optional coordinate x
    latent interaction term (models.py:74-75,114-121), always bias=False.
    """
    bound = 1.0 / math.sqrt(n_in1)
    return {"w": jax.random.uniform(key, (n_in1, n_in2, n_out), dtype, -bound, bound)}


def bilinear_apply(params: Params, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """x1: (..., n_in1), x2: (..., n_in2) -> (..., n_out)."""
    return jnp.einsum("...i,...j,ijo->...o", x1, x2, params["w"])


# ---------------------------------------------------------------------------
# MLP stacks (shared shape between the three reference networks)
# ---------------------------------------------------------------------------


def mlp_init(key: jax.Array, dims: List[int], resid_hidden: bool = False,
             dtype=jnp.float32) -> List[Params]:
    """A stack of dense layers with torch-default init.

    ``dims`` = [in, h, h, ..., out].  When ``resid_hidden`` the hidden->hidden
    layers are residual (`act(Wx + x)`, reference ResidLinear models.py:13-21)
    — the parameter shape is identical, only the apply differs.
    """
    keys = jax.random.split(key, len(dims) - 1)
    return [
        linear_init(k, dims[i], dims[i + 1], dtype=dtype)
        for i, k in enumerate(keys)
    ]


def mlp_apply(layers: List[Params], x: jax.Array, act, resid_hidden: bool = False,
              final_act=None) -> jax.Array:
    """Apply [Linear, act]*(n-1), Linear, (final_act).

    Mirrors the layer layout built by the reference networks: every layer but
    the last is followed by the activation; hidden->hidden layers become
    residual when ``resid_hidden`` (the first layer never is — its input width
    differs, models.py:31-40).
    """
    n = len(layers)
    for i, p in enumerate(layers[:-1]):
        h = linear_apply(p, x)
        if resid_hidden and i > 0:
            h = h + x
        x = act(h)
    x = linear_apply(layers[-1], x)
    if final_act is not None:
        x = final_act(x)
    return x
