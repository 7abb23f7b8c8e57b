"""Named sharding rules for spatial-VAE training.

Strategy (SURVEY.md sections 2.4, 5.7):

- batch arrays: P('data') on the leading axis (pure DP).
- q-net first-layer weight (n_in, H): P(None, 'model') — column/tensor
  parallel; its output activations inherit the 'model' sharding and the
  following hidden layers run row/column-cycled by GSPMD.
- decoder hidden activations (B, HW, H): constrained to
  P('data', 'model', None) — pixel-axis sequence parallelism; the recon
  log-prob partial sums all-reduce once per step.
- everything else: replicated.

GSPMD inserts the collectives; we only annotate.  The constraint hook for
the decoder lives in objectives/elbo via ``set_activation_sharding``.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params: dict, mesh: Mesh,
                    tp_mode: str = "column") -> dict:
    """Per-leaf NamedShardings: q first layer tensor-parallel, rest
    replicated.

    tp_mode (SURVEY 5.7):
    - 'column' (default): w0 P(None, 'model') — output features sharded;
      activations inherit the 'model' sharding, bias sharded to match.
    - 'row': w0 P('model', None) — the INPUT-PIXEL dimension sharded, for
      when images outgrow one chip's copy of the (n_pixels, H) weight;
      each device holds a pixel slice and GSPMD inserts the partial-sum
      all-reduce after the first GEMM (row-parallel linear).  Bias stays
      replicated (it adds after the reduction).
    """
    if tp_mode not in ("column", "row"):
        raise ValueError(f"tp_mode must be 'column' or 'row': {tp_mode!r}")

    def assign(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        # q-net first layer: params['q']['layers'][0]['w'|'b']
        if keys[:3] == ["q", "layers", 0] and mesh.shape["model"] > 1:
            if keys[3] == "w" and leaf.ndim == 2:
                spec = (P(None, "model") if tp_mode == "column"
                        else P("model", None))
                return NamedSharding(mesh, spec)
            if keys[3] == "b" and leaf.ndim == 1 and tp_mode == "column":
                return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params: dict, mesh: Mesh, tp_mode: str = "column") -> dict:
    return jax.device_put(params, param_shardings(params, mesh, tp_mode))


# --- activation-sharding hook (used by the decoder hot path) ---------------

_ACTIVATION_MESH: Optional[Mesh] = None


def set_activation_sharding(mesh: Optional[Mesh]):
    """Set the ambient decoder activation-sharding hook.

    Pass None to disable (single-chip).  This is process-global: with two
    live trainers on different meshes, prefer ``activation_sharding_scope``
    around each trace (Trainer._loss does) so they cannot clobber each
    other."""
    global _ACTIVATION_MESH
    _ACTIVATION_MESH = mesh


@contextlib.contextmanager
def activation_sharding_scope(mesh: Optional[Mesh]):
    """Pin the decoder activation-sharding hook to ``mesh`` while a trace
    runs (the body of a jitted function executes at trace time, so this
    correctly scopes the constraint to the trainer whose step is being
    traced).  The hook stays a module global because the model apply
    functions are pure and signature-stable — this scope is what keeps
    the global from leaking between trainers."""
    global _ACTIVATION_MESH
    prev = _ACTIVATION_MESH
    _ACTIVATION_MESH = mesh
    try:
        yield
    finally:
        _ACTIVATION_MESH = prev


def constrain_decoder_hidden(h: jax.Array) -> jax.Array:
    """Constrain (B, HW, H) decoder hidden activations to
    P('data', 'model', None) when a mesh is active.

    Axes that do not divide evenly by their mesh axis (e.g. a trailing
    partial batch, or a non-aligned pixel count) stay UNCONSTRAINED —
    P(None) would be an explicit REPLICATION constraint, forcing an
    all-gather of exactly the activation this hook exists to shard."""
    mesh = _ACTIVATION_MESH
    if mesh is None:
        return h
    # inside shard_map the mesh axes are Manual and h is a per-device
    # local array — a GSPMD sharding constraint there is illegal AND
    # meaningless (the shard_map SPMD path does its own DP); no-op
    am = jax.sharding.get_abstract_mesh()
    if am is not None and any(
            t == jax.sharding.AxisType.Manual for t in am.axis_types):
        return h
    dims = {}
    if h.shape[0] % mesh.shape["data"] == 0:
        dims[0] = "data"
    if h.ndim >= 3 and h.shape[1] % mesh.shape["model"] == 0:
        dims[1] = "model"
    if not dims:
        return h
    spec = [P.UNCONSTRAINED] * h.ndim
    for i, name in dims.items():
        spec[i] = name
    return jax.lax.with_sharding_constraint(
        h, NamedSharding(mesh, P(*spec)))
