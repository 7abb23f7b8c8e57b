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
    leaves so it can ride a scan carry / donated TrainState.

    The third field ``ns`` is the quant scale for the NEXT step's
    emission: the single-pass Adam+emit kernel (``_adam_emit_leaf``)
    quantises p' with the scale derived from the PREVIOUS step's
    abs-max (so q never waits on a second pass over p') and emits the
    fresh abs-max for the step after.  Here, at seeding time, ns is the
    same value as s — built as a distinct buffer because the seeded
    TrainState is donated to the epoch scan and donated pytrees must
    not contain aliased leaves (round-3 gotcha)."""
    if on:
        mx = jnp.max(jnp.abs(p.astype(jnp.float32)))
        s = (mx / 127.0 + 1e-30).reshape(1, 1)
        q = jnp.clip(jnp.round(p.astype(jnp.float32) / s), -127, 127
                     ).astype(jnp.int8)
        return {"q": q, "s": s, "ns": s + 0.0}
    return {"q": jnp.zeros((0, 0), jnp.int8),
            "s": jnp.zeros((1, 1), jnp.float32),
            "ns": jnp.zeros((1, 1), jnp.float32)}


def _adam_emit_kernel(c_ref, s_ref, g_ref, m_ref, v_ref, p_ref,
                      mo_ref, vo_ref, po_ref, sh_ref, q_ref, mx_ref,
                      *, lr, b1, b2, eps):
    """One row-block: Adam m'/v'/p' + bf16 shadow + int8 copy + abs-max.

    The int8 copy is quantised with the CARRIED scale (s_ref, derived
    from the previous step's abs-max) so the whole emission is a single
    read of (g, m, v, p) and a single write of every output — no second
    pass over p' for a fresh max.  The clip is load-bearing here (the
    new max can exceed the stale one) AND speed-positive (round-3:
    clip+round+cast lowers to a saturating convert)."""
    g = g_ref[:, :].astype(jnp.float32)
    m = b1 * m_ref[:, :].astype(jnp.float32) + (1.0 - b1) * g
    v = b2 * v_ref[:, :].astype(jnp.float32) + (1.0 - b2) * (g * g)
    c1 = c_ref[0, 0]
    c2 = c_ref[0, 1]
    p2 = p_ref[:, :] + (-lr) * (m / c1) / (jnp.sqrt(v / c2) + eps)
    mo_ref[:, :] = m.astype(mo_ref.dtype)
    vo_ref[:, :] = v.astype(vo_ref.dtype)
    po_ref[:, :] = p2
    sh_ref[:, :] = p2.astype(sh_ref.dtype)
    inv = 1.0 / s_ref[0, 0]
    q_ref[:, :] = jnp.clip(jnp.round(p2 * inv), -127.0, 127.0
                           ).astype(jnp.int8)
    # Mosaic cannot store scalars to VMEM: keep the abs-max as a (1, 1)
    # tile throughout
    bm = jnp.max(jnp.abs(p2)).reshape(1, 1)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        mx_ref[0:1, 0:1] = bm

    @pl.when(i != 0)
    def _acc():
        mx_ref[0:1, 0:1] = jnp.maximum(mx_ref[0:1, 0:1], bm)


def _emit_block_rows(r: int, c: int, g_dt, m_dt) -> int:
    """Largest row-block that divides r, is a multiple of 8, and keeps
    the per-grid-step VMEM footprint near ~12 MB (double-buffered by
    Mosaic).  0 = no such divisor (caller falls back to the XLA path)."""
    bytes_per_row = c * (g_dt.itemsize + 2 * m_dt.itemsize + 4  # g,m,v,p
                         + 2 * m_dt.itemsize + 4 + 2 + 1)       # m',v',p',sh,q
    cap = max(8, (12 << 20) // max(1, bytes_per_row))
    best = 0
    for bs in range(8, min(r, cap) + 1, 8):
        if r % bs == 0:
            best = bs
    return best


def _adam_emit_leaf(g, m, v, p, c12, s_in, lr, b1, b2, eps, shadow_dtype,
                    interpret):
    """(m', v', p', shadow, q, max|p'|) in ONE HBM pass over the leaf.

    Built to replace the XLA pair {Adam abs_reduce_fusion + separate
    clamp_convert emission pass} whose split is XLA's fusion-budget
    choice, not a data dependency (round-3 stale-scale probe).
    MEASURED NEGATIVE (round 5, bench B=4096): 100.1 ms/step vs 94.9
    for the XLA pair — Mosaic runs the HBM-bound pass well above XLA's
    rate (the round-2 Pallas-Adam finding) and the two mid-while-body
    pallas_calls forfeit XLA's fusion/overlap around them, swamping the
    ~0.8 ms of emission re-reads they eliminate.  Kept env-gated
    (SPATIALVAE_ADAM_EMIT=pallas) as the measured record; TPU-verified
    numerics (m/v exact, p' 1 ulp, abs-max exact, 30/61M int8 round-
    boundary flips vs the fresh-scale reference)."""
    r, c = p.shape
    bs = _emit_block_rows(r, c, g.dtype, m.dtype)
    grid = (r // bs,)
    vm = pltpu.VMEM

    row_spec = pl.BlockSpec((bs, c), lambda i: (i, 0), memory_space=vm)
    mx_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=vm)
    out_shape = [jax.ShapeDtypeStruct((r, c), dt)
                 for dt in (m.dtype, m.dtype, jnp.float32, shadow_dtype,
                            jnp.int8)]
    import functools
    return pl.pallas_call(
        functools.partial(_adam_emit_kernel, lr=lr, b1=b1, b2=b2, eps=eps),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 2), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  row_spec, row_spec, row_spec, row_spec],
        out_specs=(row_spec,) * 5 + (mx_spec,),
        out_shape=tuple(out_shape) + (jax.ShapeDtypeStruct((1, 1),
                                                           jnp.float32),),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(c12, s_in, g, m, v, p)


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
                     shadow_dtype=None, quant_min_elems=None,
                     prev_quant=None, emit_kernel=True):
        """Returns (params', state') — or (params', state', shadow') when
        ``shadow_dtype`` is given: shadow' is the params in that dtype,
        emitted by the same pass (no separate cast over the big leaves).

        With ``quant_min_elems`` also returns qshadow: a params-shaped
        tree of {"q": int8, "s": (1,1) f32, "ns": (1,1) f32}
        per-tensor-symmetric copies of every 2-D leaf with at least that
        many elements (empty arrays elsewhere).

        ``prev_quant``: the PREVIOUS step's qshadow tree.  When given
        AND KernelConfig.adam_emit == 'pallas' (opt-in; the default is
        'xla' — the kernel is a measured negative, see _adam_emit_leaf),
        the big leaves take the single-pass Pallas Adam+emit kernel:
        q is quantised with the scale carried in prev_quant[leaf]["ns"]
        (one step stale) so the separate clamp_convert emission pass
        over p' disappears.
        Without it, XLA fuses the max/round into the Adam loop and a
        fusion-budget-split emission pass writes the int8/bf16 copies
        (the round-3 stale-scale probe showed that split is XLA's
        choice, not a data dependency).  ``emit_kernel=False`` forces
        the XLA path — the mesh tail step runs under plain-jit GSPMD,
        which cannot partition a pallas_call."""
        count = state.count + 1
        cf = count.astype(jnp.float32)
        c1 = 1.0 - b1 ** cf
        c2 = 1.0 - b2 ** cf
        c12 = jnp.stack([c1, c2]).reshape(1, 2)

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        flat_p = treedef.flatten_up_to(params)
        flat_pq = (treedef.flatten_up_to(prev_quant)
                   if prev_quant is not None else [None] * len(flat_p))

        from spatialvae_tpu.kernels.config import KernelConfig
        use_emit = (emit_kernel and quant_min_elems is not None
                    and shadow_dtype is not None
                    and prev_quant is not None
                    and KernelConfig.from_env().adam_emit == "pallas")
        use_kernel = _use_pallas_kernel()
        new_p, new_m, new_v, new_s, new_q = [], [], [], [], []
        for g, m, v, p, pq in zip(flat_g, flat_m, flat_v, flat_p, flat_pq):
            if (use_emit and p.ndim == 2 and p.size >= quant_min_elems
                    and p.dtype == jnp.float32
                    and _emit_block_rows(p.shape[0], p.shape[1],
                                         g.dtype, m.dtype)):
                s_in = pq["ns"]
                m2, v2, p2, s2, q2, mx = _adam_emit_leaf(
                    g, m, v, p, c12, s_in, learning_rate, b1, b2, eps,
                    shadow_dtype, interpret)
                new_q.append({"q": q2, "s": s_in,
                              "ns": mx / 127.0 + 1e-30})
                new_p.append(p2)
                new_m.append(m2)
                new_v.append(v2)
                new_s.append(s2)
                continue
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
