"""Adam update+apply in one pass, with an optional bf16 shadow output.

XLA's fused Adam (train/optimizer.py) still materialises the `updates`
tree between optax's update() and apply_updates(): for the 87M-parameter
galaxy encoder that is an extra full read+write of a parameter-sized f32
array every step (~0.7 GB), plus separate fusions for the bf16 compute
cast.  This module's ``update_apply`` computes m'/v'/p' (and optionally
p' in the compute dtype — the "shadow" the next step differentiates, see
trainer.TrainState) in ONE expression per leaf so XLA emits one fused
loop, eliminating both.

A per-leaf Pallas kernel variant exists behind SPATIALVAE_PALLAS_ADAM=1
but measured SLOWER than XLA's fusions (70.2 vs 63.4 ms/step at B=2048)
— Mosaic buys nothing on a pure HBM-bound elementwise pass.

Numerics are the same operation sequence as optimizer.fused_adam
(b1=0.9, b2=0.999, eps outside the sqrt, bias correction by c1/c2), so
results match the XLA path to float-associativity (tested in
tests/test_optimizer_pallas.py).  torch/optax parity therefore carries
over from tests/test_optimizer.py.

Reference semantics: torch.optim.Adam defaults, /root/reference/
train_mnist.py:392 (optimiser construction), :147-150 (step order).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spatialvae_tpu.train.optimizer import FusedAdamState

# leaves at least this large ride the Pallas kernel when it is enabled.
# MEASURED (bench B=2048): the Pallas per-leaf kernel made the step 70.2 ms
# vs 63.4 with XLA's own fusions — Mosaic's pure-DMA-bound elementwise
# loses to XLA here, so the kernel is opt-in (SPATIALVAE_PALLAS_ADAM=1)
# and the default update_apply path is a single XLA tree pass.  The real
# wins this module keeps are structural: update+apply in ONE expression
# (no materialised `updates` tree) and the bf16 shadow emitted in the same
# fusion (see TrainState.shadow).
_MIN_KERNEL_ELEMS = 1 << 20


def _use_pallas_kernel() -> bool:
    import os
    return os.environ.get("SPATIALVAE_PALLAS_ADAM") == "1"


def _adam_kernel(c_ref, g_ref, m_ref, v_ref, p_ref, mo_ref, vo_ref, po_ref,
                 *shadow_ref, lr, b1, b2, eps):
    g = g_ref[:, :].astype(jnp.float32)
    m = b1 * m_ref[:, :] + (1.0 - b1) * g
    v = b2 * v_ref[:, :] + (1.0 - b2) * (g * g)
    c1 = c_ref[0, 0]
    c2 = c_ref[0, 1]
    update = -lr * (m / c1) / (jnp.sqrt(v / c2) + eps)
    p2 = p_ref[:, :] + update
    mo_ref[:, :] = m
    vo_ref[:, :] = v
    po_ref[:, :] = p2
    if shadow_ref:
        shadow_ref[0][:, :] = p2.astype(shadow_ref[0].dtype)


def _adam_leaf_pallas(g, m, v, p, c12, lr, b1, b2, eps, interpret,
                      shadow_dtype=None):
    """One (R, C) leaf: (m', v', p'[, p'_shadow]) in a single HBM pass."""
    r, c = p.shape
    # block rows so one block is ~2-6 MB per operand (DMA-friendly), and
    # rows stay whole so the grid is 1-D
    target = max(1, (4 << 20) // max(1, c * 4))
    bs = min(r, max(8, (target // 8) * 8))
    grid = ((r + bs - 1) // bs,)

    vm = pltpu.VMEM
    spec = pl.BlockSpec((bs, c), lambda i: (i, 0), memory_space=vm)
    out_specs = [spec, spec, spec]
    out_shape = [jax.ShapeDtypeStruct((r, c), jnp.float32),
                 jax.ShapeDtypeStruct((r, c), jnp.float32),
                 jax.ShapeDtypeStruct((r, c), jnp.float32)]
    if shadow_dtype is not None:
        out_specs.append(spec)
        out_shape.append(jax.ShapeDtypeStruct((r, c), shadow_dtype))
    import functools
    out = pl.pallas_call(
        functools.partial(_adam_kernel, lr=lr, b1=b1, b2=b2, eps=eps),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 2), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  spec, spec, spec, spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(c12, g, m, v, p)
    return out


def quantize_leaf(p, on: bool):
    """Per-tensor-symmetric int8 copy of p, or empty placeholders.

    Placeholders keep the qshadow pytree structure identical across
    leaves so it can ride a scan carry / donated TrainState."""
    if on:
        s = (jnp.max(jnp.abs(p.astype(jnp.float32))) / 127.0
             + 1e-30).reshape(1, 1)
        q = jnp.clip(jnp.round(p.astype(jnp.float32) / s), -127, 127
                     ).astype(jnp.int8)
        return {"q": q, "s": s}
    return {"q": jnp.zeros((0, 0), jnp.int8),
            "s": jnp.zeros((1, 1), jnp.float32)}


class PallasAdam(NamedTuple):
    """optax-like triple plus a fused update+apply entry point."""
    init: object
    update: object
    update_apply: object


def fused_adam_pallas(learning_rate: float, b1: float = 0.9,
                      b2: float = 0.999, eps: float = 1e-8,
                      interpret: bool = False) -> PallasAdam:
    from spatialvae_tpu.train.optimizer import fused_adam

    base = fused_adam(learning_rate, b1=b1, b2=b2, eps=eps)

    def update_apply(grads, state: FusedAdamState, params,
                     shadow_dtype=None, quant_min_elems=None):
        """Returns (params', state') — or (params', state', shadow') when
        ``shadow_dtype`` is given: shadow' is the params in that dtype,
        emitted by the same pass (no separate cast over the big leaves).

        With ``quant_min_elems`` also returns qshadow: a params-shaped
        tree of {"q": int8, "s": (1,1) f32} per-tensor-symmetric copies of
        every 2-D leaf with at least that many elements (empty arrays
        elsewhere).  XLA fuses the max/round into the Adam loop, so the
        big-GEMM int8 weights cost one extra int8 write — not the separate
        full quantisation pass that sank the round-1 int8 encoder."""
        count = state.count + 1
        cf = count.astype(jnp.float32)
        c1 = 1.0 - b1 ** cf
        c2 = 1.0 - b2 ** cf
        c12 = jnp.stack([c1, c2]).reshape(1, 2)

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        flat_p = treedef.flatten_up_to(params)

        use_kernel = _use_pallas_kernel()
        new_p, new_m, new_v, new_s, new_q = [], [], [], [], []
        for g, m, v, p in zip(flat_g, flat_m, flat_v, flat_p):
            # the opt-in Pallas kernel writes f32 moment AND param refs;
            # bf16-moment leaves (SPATIALVAE_ADAM_MOMENTS=bf16) and any
            # non-f32 param leaf take the XLA path — the kernel's f32 p'
            # output would silently flip the leaf dtype and break the
            # scan-carry/donation pytree structure
            if (use_kernel and p.ndim == 2 and p.size >= _MIN_KERNEL_ELEMS
                    and m.dtype == jnp.float32
                    and p.dtype == jnp.float32):
                out = _adam_leaf_pallas(
                    g, m, v, p, c12, learning_rate, b1, b2, eps, interpret,
                    shadow_dtype=shadow_dtype)
                m2, v2, p2 = out[0], out[1], out[2]
                s2 = out[3] if shadow_dtype is not None else None
            else:
                # the ONE shared Adam leaf definition (optimizer.adam_leaf)
                from spatialvae_tpu.train.optimizer import adam_leaf

                upd, m2, v2 = adam_leaf(g, m, v, c1, c2, learning_rate,
                                        b1, b2, eps)
                p2 = p + upd
                s2 = (p2.astype(shadow_dtype)
                      if shadow_dtype is not None else None)
            if quant_min_elems is not None:
                new_q.append(quantize_leaf(
                    p2, p2.ndim == 2 and p2.size >= quant_min_elems))
            new_p.append(p2)
            new_m.append(m2)
            new_v.append(v2)
            new_s.append(s2)

        st = FusedAdamState(count, treedef.unflatten(new_m),
                            treedef.unflatten(new_v))
        out = (treedef.unflatten(new_p), st)
        if shadow_dtype is not None:
            out = out + (treedef.unflatten(new_s),)
        if quant_min_elems is not None:
            out = out + (treedef.unflatten(new_q),)
        return out

    return PallasAdam(init=base.init, update=base.update,
                      update_apply=update_apply)
