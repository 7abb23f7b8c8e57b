"""Unified trainer for all three spatial-VAE workloads.

Replaces the three copy-pasted epoch loops of the reference
(train_mnist.py:127-226, train_particles.py:151-245, train_galaxy.py:186-294)
with one driver, configured by ElboConfig/TrainConfig.

TPU-first structure:

- the whole dataset lives in HBM; each epoch is ONE jitted computation:
  ``lax.scan`` over permuted batch indices, with the per-step gather, the
  optional rotation augmentation, the ELBO, the backward pass and the Adam
  update all inside the scan body.  The only device->host transfer per epoch
  is the stacked (num_batches, 3) metric array (the reference syncs three
  scalars per *step*, train_mnist.py:152-154 — SURVEY.md section 7.3.5).
- the trailing partial batch runs through a separately-jitted step so all
  shapes stay static (one extra compile, cached).
- ``z_scale`` (the --z-delay curriculum, train_particles.py:500-504) is a
  traced scalar argument — flipping it between epochs does not recompile.
- optional bfloat16 compute: parameters/batches are cast to bf16 for the
  forward/backward pass while the Adam state and updates stay float32.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spatialvae_tpu.core.config import InferenceConfig
from spatialvae_tpu.models import (
    inference_apply,
    inference_init,
    spatial_generator_apply,
    spatial_generator_init,
    vanilla_generator_apply,
    vanilla_generator_init,
)
from spatialvae_tpu.core.config import VanillaGeneratorConfig
from spatialvae_tpu.objectives import ElboConfig, elbo_minibatch
from spatialvae_tpu.train.metrics import StreamingMeans
from spatialvae_tpu.transforms.augment import rotate_images_bicubic


@dataclass(frozen=True)
class TrainConfig:
    minibatch_size: int = 100
    learning_rate: float = 1e-4
    num_epochs: int = 100
    z_delay: int = 0
    augment_rotation: bool = False
    # galaxy quirk (train_galaxy.py:47-54): the reference rotates a
    # float->uint8 PIL view and divides back by 255, so the inference net
    # sees an augmented image quantised to the /255 grid.  When set, the
    # rotated view is rounded onto that grid (clip to [0,1] like PIL's
    # uint8 store); the input is real /255-grid data so the reference's
    # pre-rotation uint8 cast is already exact.
    augment_uint8: bool = False
    seed: int = 0
    compute_dtype: str = "float32"          # 'float32' | 'bfloat16'
    image_shape: Optional[Tuple[int, int]] = None   # (n, m)
    channels: int = 1


class TrainState(NamedTuple):
    params: dict           # {'q': ..., 'p': ...} (f32 masters)
    opt_state: object
    # compute-dtype copy of params emitted by the Pallas Adam pass (TPU
    # bf16 hot path only): the loss differentiates THIS tree, so the
    # per-step f32->bf16 cast and the f32 gradient materialisation both
    # disappear.  None outside the shadow path.
    shadow: Optional[dict] = None
    # int8 copies of the big encoder weights (params-shaped tree of
    # {"q", "s"}, empty leaves elsewhere), also emitted by the Adam pass.
    # Only populated in int8 mode — the encoder hidden GEMMs then run on
    # the int8 MXU (see objectives/elbo.py q_quant).
    qshadow: Optional[dict] = None


# encoder leaves at least this large get int8 copies from the Adam pass
# (catches the two big q hidden weights; p-net and heads stay bf16)
_QENC_MIN_ELEMS = 8 << 20

# sentinel: "use the trainer's own mask" (None means "no mask" — the
# pixel-sharded step passes its mask TILE, which may legitimately be None)
_INHERIT = object()


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
        else a, tree)


@jax.jit
def _quantize_dataset(arr):
    """Per-tensor int8 copy of a dataset, under jit so XLA fuses the
    scale/round/clip into one pass — eagerly this materialises several
    dataset-sized f32 temporaries and can exhaust HBM at bench scale.
    Module-level so repeated cache misses reuse ONE compiled program per
    shape instead of re-tracing a fresh closure.  Delegates to the
    weight-side quantize_leaf so the dataset and Adam-emitted weight
    grids share ONE quant convention (scale epsilon, clip bounds) and
    can never silently diverge."""
    from spatialvae_tpu.train.optimizer_pallas import quantize_leaf

    e = quantize_leaf(arr.reshape(arr.shape[0], -1), True)
    return e["q"], e["s"]


# the two dataset passes below are module-level jits for the same reason
# as _quantize_dataset: repeated _yt_cache misses (cycling 3+ datasets
# through the 2-entry cache) must reuse ONE compiled program per shape
# instead of re-tracing a fresh closure every call.  Both are single
# fused passes so the HBM peak stays at one dataset-sized transient (the
# naive probe materialised three f32 copies of a 3.2 GB dataset and
# OOM'd the bench at B=4096).


@jax.jit
def _probe_255_grid(a):
    """(max |255a - round(255a)|, min, max of round(255a)) — detects data
    sitting exactly on the uint8/255 grid."""
    scaled = a.astype(jnp.float32) * 255.0
    q = jnp.round(scaled)
    return (jnp.max(jnp.abs(scaled - q)), jnp.min(q), jnp.max(q))


@partial(jax.jit, static_argnums=(1, 2))
def _build_yt_i8(a, hw: int, colored: bool = False):
    """(N, C, HW) int8 target copy of /255-grid data, stored as k-128
    (the fused kernel dequants in its p3 pass).  ``colored`` stores the
    fit-noise pre-paired layout (N, 2, HW/2) instead — out[n, c, u] =
    a[n, 2u+c], matching the kernel's lane-split head output."""
    q = jnp.round(a.astype(jnp.float32) * 255.0) - 128.0
    q = q.astype(jnp.int8)
    if colored:
        return q.reshape(a.shape[0], hw // 2, 2).swapaxes(1, 2)
    return q.reshape(a.shape[0], hw, -1).swapaxes(1, 2)


def _pixel_spmd_ok(mesh, ecfg, p_cfg, tcfg, hw: int) -> bool:
    """True iff a model-axis mesh can run the pixel-sharded fused-kernel
    SPMD step (SURVEY §5.7 made trainer-reachable): the fused int8 loss
    kernel must be active for the PER-SHARD shapes (batch split over
    'data', HW split over 'model')."""
    if mesh is None or mesh.shape.get("model", 1) <= 1 or not ecfg.fused:
        return False
    if ecfg.likelihood == "colored":
        # the colored kernel's chunk-permuted coords pair each pixel
        # with rows from the OTHER coordinate half — a contiguous HW
        # shard does not contain its partners, so colored configs keep
        # the GSPMD fallback on model-axis meshes
        return False
    nd = mesh.shape.get("data", 1)
    nm = mesh.shape["model"]
    b = tcfg.minibatch_size
    if b % nd:
        return False
    from spatialvae_tpu.objectives.elbo import fused_loss_active
    from spatialvae_tpu.parallel.pixel import can_pixel_shard

    return (can_pixel_shard(hw, nm)
            and fused_loss_active(ecfg, p_cfg, hw // nm, b // nd))


def grad_target(state: "TrainState"):
    """(tree to differentiate, q_quant) for a training step.

    The loss differentiates the bf16 shadow copy when present (the Adam
    pass emitted it last step); the int8 encoder weights ride along when
    the qshadow is populated.  One definition shared by the single-chip
    step and the shard_map per-device step so the two can never drift."""
    if state.shadow is None:
        return state.params, None
    qq = None
    if state.qshadow is not None:
        qq = [e["w"] for e in state.qshadow["q"]["layers"][:-1]]
    return state.shadow, qq


def apply_update(optimizer, state: "TrainState", grads, compute_dtype,
                 emit_kernel: bool = True) -> "TrainState":
    """Adam update + shadow/qshadow emission -> next TrainState.

    The ONE implementation of the post-gradient half of a training step,
    shared by trainer.train_step, the mesh tail step and spmd.per_device
    (the round-3 tail-drift bug came from this logic existing in three
    places).  Whatever throughput stack the state carries (bf16 shadow,
    int8 encoder weights) is re-emitted by the same fused update+apply
    pass; a state without them takes the plain update path.

    ``emit_kernel=False`` routes the qshadow emission to the XLA path —
    required wherever the caller runs under plain-jit GSPMD (the mesh
    tail step), which cannot partition the Pallas Adam+emit kernel."""
    if state.shadow is not None:
        if state.qshadow is not None:
            params, opt_state, shadow, qshadow = optimizer.update_apply(
                grads, state.opt_state, state.params,
                shadow_dtype=compute_dtype,
                quant_min_elems=_QENC_MIN_ELEMS,
                prev_quant=state.qshadow, emit_kernel=emit_kernel)
            return TrainState(params, opt_state, shadow, qshadow)
        params, opt_state, shadow = optimizer.update_apply(
            grads, state.opt_state, state.params,
            shadow_dtype=compute_dtype)
        return TrainState(params, opt_state, shadow)
    if hasattr(optimizer, "update_apply"):
        # fused_adam upcasts mixed-precision grads inside its single
        # elementwise pass — no materialised f32 gradient copy
        params, opt_state = optimizer.update_apply(
            grads, state.opt_state, state.params)
    else:
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state)


def _warn_nonfinite(m: np.ndarray, epoch_base: int,
                    step_base: int = 0) -> None:
    """Divergence warning for a (..., num_batches, 3) metric array; the
    leading axis (if any) indexes epochs starting at ``epoch_base``.
    ``step_base`` offsets the reported step index (the tail batch passes
    the number of full batches so it does not report as 'step 1')."""
    if np.all(np.isfinite(m)):
        return
    idx = np.argwhere(~np.isfinite(m))[0]
    epoch = epoch_base + (int(idx[0]) if m.ndim == 3 else 0)
    step = step_base + int(idx[1] if m.ndim == 3 else idx[0])
    print(f"# WARNING: non-finite training metrics at epoch {epoch + 1}, "
          f"step {step + 1} — loss diverged (try --debug-nans to locate "
          f"the op)", file=sys.stderr)


@partial(jax.jit, static_argnums=1)
def _split_chain(key, num: int):
    """The (num,) per-step subkeys the epoch scan's body derives via
    ``k, sub = split(k)`` each iteration — ONE dispatch, so the host
    streaming path can consume the identical key sequence."""
    def body(k, _):
        k, sub = jax.random.split(k)
        return k, sub

    _, subs = jax.lax.scan(body, key, None, length=num)
    return subs


class Trainer:
    """Owns params, optimizer state, and the jitted step/epoch functions."""

    def __init__(self, q_cfg: InferenceConfig, p_cfg, ecfg: ElboConfig,
                 tcfg: TrainConfig, coords: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 param_dtype=jnp.float32, mesh=None,
                 tp_mode: str = "column"):
        # a stray SPATIALVAE_* env var must not silently alter training
        # numerics — measurement levers are for tools/bench.py only
        from spatialvae_tpu.kernels.config import check_numerics_default

        check_numerics_default()
        self.q_cfg = q_cfg
        self.p_cfg = p_cfg
        self.ecfg = ecfg
        self.tcfg = tcfg
        self.coords = jnp.asarray(coords)
        self.mask = None if mask is None else jnp.asarray(mask)
        self.mesh = mesh
        # remembered so resume (cli.common.maybe_resume) can re-place
        # loaded checkpoints with the same TP layout the init used
        self.tp_mode = tp_mode

        key = jax.random.PRNGKey(tcfg.seed)
        self.base_key, kq, kp = jax.random.split(key, 3)
        q_params = inference_init(kq, q_cfg, dtype=param_dtype)
        if isinstance(p_cfg, VanillaGeneratorConfig):
            p_params = vanilla_generator_init(kp, p_cfg, dtype=param_dtype)
        else:
            p_params = spatial_generator_init(kp, p_cfg, dtype=param_dtype)

        from spatialvae_tpu.train.optimizer import fused_adam

        # DP meshes take the shard_map SPMD step (see _build_steps), where
        # each device runs the full single-chip step — including pallas
        # calls — on its shard; the fused update+apply (and the bf16
        # shadow / int8 encoder-weight emission that ride it) therefore
        # carry over to multi-chip.  Model-parallel meshes use the GSPMD
        # path, which cannot partition a pallas_call: plain XLA Adam there.
        spmd_dp = (mesh is not None and mesh.shape.get("model", 1) == 1
                   and ecfg.fused)
        # model-axis meshes whose shapes fit the fused kernel per pixel
        # shard take the explicitly-SPMD pixel step (parallel/spmd.py
        # make_spmd_pixel_step) — every device runs the full update like
        # the DP path, so the fused update+apply optimizer carries over
        spmd_pixel = _pixel_spmd_ok(mesh, ecfg, p_cfg, tcfg,
                                    self.coords.shape[0])
        if jax.default_backend() == "tpu" and (mesh is None or spmd_dp
                                               or spmd_pixel):
            from spatialvae_tpu.train.optimizer_pallas import (
                fused_adam_pallas,
            )
            self.optimizer = fused_adam_pallas(tcfg.learning_rate)
        else:
            self.optimizer = fused_adam(tcfg.learning_rate)
        params = {"q": q_params, "p": p_params}
        if mesh is not None:
            # multi-chip: TP-shard the q first layer, replicate the rest,
            # and turn on the pixel-axis decoder sharding constraint
            from spatialvae_tpu.parallel.sharding import (
                replicated,
                set_activation_sharding,
                shard_params,
            )

            set_activation_sharding(mesh)
            if spmd_pixel:
                # the pixel-sharded shard_map step replicates the state
                # across the mesh (each device holds full params and the
                # kernel shards PIXELS) — TP-sharding the q first layer
                # would force a per-step all-gather through the step's
                # replicated in_specs
                params = jax.device_put(params, replicated(mesh))
            else:
                params = shard_params(params, mesh, tp_mode)
            self.state = TrainState(params,
                                    jax.jit(self.optimizer.init)(params))
        else:
            from spatialvae_tpu.parallel.sharding import (
                set_activation_sharding,
            )

            set_activation_sharding(None)   # clear any stale mesh hook
            self.state = TrainState(params, self.optimizer.init(params))

        self._compute_dtype = (jnp.bfloat16
                               if tcfg.compute_dtype == "bfloat16"
                               else jnp.float32)
        self._build_steps()

    # ------------------------------------------------------------------ loss
    def _loss(self, params, y, ctf, key, z_scale, ecfg=None, y_t=None,
              q_quant=None, y_q8=None, augment=True, noise=None,
              coords=None, mask=_INHERIT, pixel_axis=None):
        """coords/mask default to the trainer's full grid; the pixel-
        sharded SPMD step passes this device's HW tile plus its mesh axis
        name (see parallel.spmd.make_spmd_pixel_step)."""
        ecfg = ecfg or self.ecfg
        cd = self._compute_dtype
        q_params = _cast_tree(params["q"], cd)
        p_params = _cast_tree(params["p"], cd)
        y = y.astype(cd)
        coords = (self.coords if coords is None else coords).astype(cd)
        mask = self.mask if mask is _INHERIT else mask

        y_inf = None
        offsets = None
        # augmentation is a TRAINING regulariser only: the reference's
        # eval_model never rotates (train_particles.py:204-228 passes no
        # augment_rotation) — eval_step calls with augment=False
        if augment and self.tcfg.augment_rotation and self.ecfg.rotate \
                and not self.ecfg.vanilla:
            key, k_off = jax.random.split(key)
            b = y.shape[0]
            offsets = jax.random.uniform(k_off, (b,), y.dtype, 0.0,
                                         2.0 * np.pi)
            n, m = self.tcfg.image_shape
            if self.tcfg.channels > 1:
                imgs = y.reshape(b, n, m, self.tcfg.channels)
            else:
                imgs = y.reshape(b, n, m)
            y_inf = rotate_images_bicubic(imgs, offsets).reshape(y.shape)
            if self.tcfg.augment_uint8:
                # /255-grid quantisation of the rotated view (see
                # TrainConfig.augment_uint8); rounding in f32 — the bf16
                # compute dtype cannot represent the grid
                y_inf = (jnp.round(jnp.clip(y_inf.astype(jnp.float32),
                                            0.0, 1.0) * 255.0)
                         / 255.0).astype(y.dtype)

        from spatialvae_tpu.parallel.sharding import activation_sharding_scope

        # scope the decoder sharding hook to THIS trainer's mesh for the
        # duration of the trace — two trainers on different meshes in one
        # process must not clobber each other through the module global
        # (inside the shard_map SPMD path the hook no-ops regardless)
        with activation_sharding_scope(self.mesh):
            elbo, log_p, kl, _ = elbo_minibatch(
                q_params, p_params, self.q_cfg, self.p_cfg, ecfg,
                coords, y, key,
                noise=noise,
                y_inf=y_inf, offsets=offsets, z_scale=z_scale,
                ctf=None if ctf is None else ctf.astype(cd),
                mask=mask,
                image_shape=self.tcfg.image_shape,
                y_t=y_t,
                q_quant=q_quant,
                y_q8=y_q8,
                pixel_axis=pixel_axis,
            )
        loss = -elbo.astype(jnp.float32)
        aux = jnp.stack([elbo.astype(jnp.float32),
                         -log_p.astype(jnp.float32),
                         kl.astype(jnp.float32)])
        return loss, aux

    # ----------------------------------------------------------------- steps
    def _build_steps(self):
        grad_fn = jax.value_and_grad(self._loss, has_aux=True)

        # DP meshes run the explicitly-SPMD shard_map step so the fused
        # Pallas decoder works multi-chip (GSPMD can't partition a
        # pallas_call); model-axis meshes whose shapes fit the kernel per
        # pixel shard run the pixel-sharded shard_map step (SURVEY §5.7);
        # remaining model-parallel configs use the GSPMD path.
        self._spmd = (self.mesh is not None
                      and self.mesh.shape.get("model", 1) == 1
                      and self.ecfg.fused)
        self._spmd_pixel = _pixel_spmd_ok(self.mesh, self.ecfg, self.p_cfg,
                                          self.tcfg, self.coords.shape[0])

        # bf16 shadow-params fast path (see TrainState.shadow): wherever
        # the fused update+apply optimizer is active and compute is bf16 —
        # single chip, or the shard_map DP path (each device runs the full
        # single-chip step on replicated params, so the shadow/qshadow
        # emission is identical across devices)
        self._use_shadow = (hasattr(self.optimizer, "update_apply")
                            and self._compute_dtype == jnp.bfloat16
                            and (self.mesh is None or self._spmd
                                 or self._spmd_pixel))
        # int8 encoder (TrainState.qshadow) only in int8 speed mode — the
        # quality contract is the same horizon band as the int8 decoder
        self._use_qenc = self._use_shadow and bool(self.ecfg.int8)

        # evaluation and display run through plain jit (GSPMD under a mesh),
        # where a pallas_call cannot be partitioned — use the XLA decoder
        import dataclasses
        import functools

        # eval/display config: under a mesh the GSPMD path cannot partition
        # a pallas_call (fused off entirely); single-chip eval keeps the
        # fused forward DECODER but drops the fused LOSS kernel — its
        # primal computes and writes all five gradient tensors (~3x the
        # forward-only cost) just to carry the scalar BCE, pure waste when
        # nothing differentiates it
        self._nonstep_ecfg = (dataclasses.replace(self.ecfg, fused=False)
                              if self.mesh is not None
                              else dataclasses.replace(self.ecfg,
                                                       fused_loss=False))

        self._tail_step = None
        if self._spmd or self._spmd_pixel:
            from jax.sharding import NamedSharding, PartitionSpec
            from spatialvae_tpu.parallel.spmd import (
                make_spmd_pixel_step,
                make_spmd_step,
            )

            if self._spmd:
                spmd_step = make_spmd_step(self, self.mesh)
            else:
                spmd_step = make_spmd_pixel_step(self, self.mesh)

            # shard_map needs the batch to divide the data axis; a trailing
            # partial batch that doesn't runs through this GSPMD-replicated
            # plain step instead (XLA decoder), so every image still trains
            # exactly once per epoch like the reference's DataLoader tail
            tail_grad = jax.value_and_grad(
                functools.partial(self._loss, ecfg=self._nonstep_ecfg),
                has_aux=True)

            def tail_step(state, y, ctf, key, z_scale):
                # the tail differentiates the f32 params directly (the XLA
                # decoder path needs no bf16 shadow), but apply_update
                # re-emits whatever shadow/qshadow the state carries so the
                # tail does not silently strip the throughput stack (the
                # next epoch's scan would otherwise trace the non-shadow
                # branch: different numerics path + a fresh compile)
                (_, aux), grads = tail_grad(state.params, y, ctf, key,
                                            z_scale)
                return apply_update(self.optimizer, state, grads,
                                    self._compute_dtype,
                                    emit_kernel=False), aux

            self._tail_step = jax.jit(
                tail_step,
                out_shardings=NamedSharding(self.mesh, PartitionSpec()))

            if self._spmd:
                train_step = spmd_step
            else:
                def train_step(state, y, ctf, key, z_scale, y_t=None,
                               y_q8=None):
                    # batches the pixel-sharded kernel step cannot take —
                    # no pre-transposed y_t copy (streamed datasets) or a
                    # per-image CTF (kernel falls back anyway) — train
                    # through the replicated GSPMD step, exactly like the
                    # tails (trace-time dispatch: y_t presence is static)
                    if y_t is None or ctf is not None:
                        return tail_step(state, y, ctf, key, z_scale)
                    return spmd_step(state, y, ctf, key, z_scale, y_t,
                                     y_q8)
        else:
            def train_step(state, y, ctf, key, z_scale, y_t=None,
                           y_q8=None):
                # bf16 shadow path: the loss differentiates the
                # compute-dtype copy the previous Adam pass emitted —
                # no per-step f32->bf16 cast, bf16 gradients, and the
                # next shadow rides out of the same Adam kernel
                target, qq = grad_target(state)
                (_, aux), grads = grad_fn(
                    target, y, ctf, key, z_scale, y_t=y_t, q_quant=qq,
                    y_q8=y_q8 if state.shadow is not None else None)
                return apply_update(self.optimizer, state, grads,
                                    self._compute_dtype), aux

        # eval under a DP mesh keeps the fused FORWARD decoder by running
        # per-device inside shard_map like training does (plain-jit GSPMD
        # eval would forfeit the pallas_call and pay the XLA decoder every
        # epoch); non-divisible batches fall back to the GSPMD path below
        self._spmd_eval = None
        if self._spmd:
            from spatialvae_tpu.parallel.spmd import make_spmd_eval_step

            self._spmd_eval = make_spmd_eval_step(self, self.mesh)

        def eval_step(params, y, ctf, key, z_scale, y_t=None):
            if (self._spmd_eval is not None
                    and y.shape[0] % self.mesh.shape["data"] == 0):
                return self._spmd_eval(params, y, ctf, key, z_scale)
            _, aux = self._loss(params, y, ctf, key, z_scale,
                                ecfg=self._nonstep_ecfg, y_t=y_t,
                                augment=False)
            return aux

        def train_epoch_scan(state, data, data_t, ctf_data, data_q8, idx,
                             key, z_scale):
            """idx: (num_batches, B) permuted index batches.  data_t is an
            optional (N, C, HW) copy of data — gathering target batches in
            the kernel's layout beats a per-step (B, HW, C) transpose.
            data_q8: optional (int8 (N, n) encoder-input copy, (1,1) scale)
            — with it, the f32 image gather is dead code XLA removes."""
            def body(carry, ib):
                st, k = carry
                k, sub = jax.random.split(k)
                # mode='clip': batch indices come from a permutation and
                # are in-bounds by construction; jnp.take's default 'fill'
                # adds a per-batch select pass over every gathered tile
                # (NEGATIVE probed round 4: optimization_barrier-fencing
                # the gathers behind the previous step's metrics — so they
                # cannot prefetch during the kernel — measured 94.9 vs
                # 94.6 ms at B=4096; the in-epoch vs isolated kernel delta
                # is profiler attribution of async gathers, not contention)
                y = jnp.take(data, ib, axis=0, mode='clip')
                y_t = (None if data_t is None
                       else jnp.take(data_t, ib, axis=0, mode='clip'))
                ctf = (None if ctf_data is None
                       else jnp.take(ctf_data, ib, axis=0, mode='clip'))
                if data_q8 is None:
                    st, aux = train_step(st, y, ctf, sub, z_scale, y_t)
                else:
                    y_q8 = (jnp.take(data_q8[0], ib, axis=0, mode='clip'), data_q8[1])
                    st, aux = train_step(st, y, ctf, sub, z_scale, y_t,
                                         y_q8)
                return (st, k), aux
            (state, _), metrics = jax.lax.scan(body, (state, key), idx)
            return state, metrics

        def train_epochs_scan(state, data, data_t, ctf_data, data_q8,
                              base_key, first_epoch, z_delay, num_epochs,
                              n_images):
            """Outer lax.scan over epochs: permutation, step keys and the
            z-delay curriculum derive IN-GRAPH from the epoch index, so a
            whole multi-epoch run is one device dispatch.  Key derivation
            mirrors train_epoch exactly (fold_in(base, 2e) shuffles,
            fold_in(base, 2e+1) steps) — results are bit-identical to the
            sequential per-epoch path."""
            b = self.tcfg.minibatch_size
            num_full = n_images // b

            def epoch_body(st, e):
                sk = jax.random.fold_in(base_key, 2 * e)
                stk = jax.random.fold_in(base_key, 2 * e + 1)
                perm = jax.random.permutation(sk, n_images)
                # sort within each batch (see _index_batches)
                idx = jnp.sort(perm[:num_full * b].reshape(num_full, b),
                               axis=1)
                zs = jnp.where(e < z_delay, 0.0, 1.0).astype(jnp.float32)
                st, m = train_epoch_scan(st, data, data_t, ctf_data,
                                         data_q8, idx, stk, zs)
                return st, m

            es = first_epoch + jnp.arange(num_epochs)
            return jax.lax.scan(epoch_body, state, es)

        def eval_epoch_scan(params, data, data_t, ctf_data, idx, key,
                            z_scale):
            def body(k, ib):
                k, sub = jax.random.split(k)
                y = jnp.take(data, ib, axis=0, mode='clip')
                y_t = (None if data_t is None
                       else jnp.take(data_t, ib, axis=0, mode='clip'))
                ctf = (None if ctf_data is None
                       else jnp.take(ctf_data, ib, axis=0, mode='clip'))
                aux = eval_step(params, y, ctf, sub, z_scale, y_t)
                return k, aux
            _, metrics = jax.lax.scan(body, key, idx)
            return metrics

        self._train_step = jax.jit(train_step)
        self._eval_step = jax.jit(eval_step)
        # donate the TrainState into the epoch scan so params/opt-state
        # update in place in HBM across epochs (the state flows linearly
        # through train_epoch; the plain step stays undonated because tests
        # and the multichip dryrun reuse their input state)
        self._train_epoch_scan = jax.jit(train_epoch_scan, donate_argnums=0)
        self._train_epochs_scan = jax.jit(train_epochs_scan,
                                          donate_argnums=0,
                                          static_argnums=(8, 9))
        self._eval_epoch_scan = jax.jit(eval_epoch_scan)

    # ---------------------------------------------------------------- epochs
    def _index_batches(self, n: int, perm: Optional[jax.Array]):
        b = self.tcfg.minibatch_size
        num_full = n // b
        tail = n - num_full * b
        idx = perm if perm is not None else jnp.arange(n)
        # sort WITHIN each batch: shuffle semantics only need a random
        # PARTITION into batches (the loss/grads are sums over the batch),
        # and ascending row indices turn the per-step dataset gathers from
        # random-access into semi-sequential HBM reads.  Deterministic, so
        # bit-identical across runs/resume; train_epochs applies the same
        # sort in-graph.
        full_idx = jnp.sort(idx[:num_full * b].reshape(num_full, b), axis=1)
        tail_idx = idx[num_full * b:] if tail else None
        return full_idx, tail_idx, num_full, tail

    # cached per-dataset device copies hold dataset-sized arrays; cap the
    # caches so cycling many datasets through one trainer cannot pile up
    # copies in HBM (entries evict oldest-first)
    _DATASET_CACHE_MAX = 2

    @staticmethod
    def _cache_put(cache, key, value):
        while len(cache) >= Trainer._DATASET_CACHE_MAX:
            cache.pop(next(iter(cache)))
        cache[key] = value

    def _dataset_yt(self, dataset):
        """(N, C, HW) target copy of dataset.y for the fused int8 loss
        kernel, built once per dataset and cached (the kernel wants
        channel-major target tiles; transposing per step costs ~8 ms at
        B=2048 — gathering from a pre-transposed copy costs ~0.1 ms).

        Layout: when the data sits exactly on the /255 uint8 grid (the
        real galaxy/mnist pipelines decode PNGs and divide by 255,
        train_galaxy.py:386-387), the copy is INT8 (k/255 stored as
        k-128; the kernel dequants in p3) — half the per-step gather
        bytes of bf16 AND exact, where the bf16 copy rounds the grid to
        ~2^-9.  Off-grid data (whitened particles, synthetic floats)
        keeps the compute-dtype copy; that bf16 target rounding is
        validated by the 30-epoch horizons (tools/int8_horizon.py)."""
        y = dataset.y
        cache = getattr(self, "_yt_cache", None)
        if cache is None:
            cache = self._yt_cache = {}
        hit = cache.get(id(y))
        if hit is not None and hit[0] is y:
            return hit[1]
        n = y.shape[0]
        hw = self.coords.shape[0]
        src = jnp.asarray(y)

        err, qmin, qmax = (float(v) for v in _probe_255_grid(src))
        on_grid = err < 1e-3 and qmin >= 0.0 and qmax <= 255.0

        # the colored (fit-noise) kernel wants the pre-paired layout
        # (N, 2, HW/2): y_t[n, c, u] = y[n, 2u+c] (fused_loss_int8
        # module docstring)
        colored = self.ecfg.likelihood == "colored"
        if on_grid:
            yt = _build_yt_i8(src, hw, colored=colored)
        elif colored:
            yt = (src.reshape(n, hw // 2, 2).swapaxes(1, 2)
                  .astype(self._compute_dtype))
        else:
            yt = (src.reshape(n, hw, -1).swapaxes(1, 2)
                  .astype(self._compute_dtype))
        if not colored:
            # non-tile-aligned images (MNIST 784, odd cryo-EM dims): the
            # kernel consumes the zero-padded pixel count; pad ONCE at
            # dataset build so the per-step gather stays a pure gather.
            # Pad value is the int8 grid's zero (-128 = 0/255) or 0.0 —
            # the kernel's forced pad mask zeroes the contribution either
            # way (fused_loss_int8.padded_hw)
            from spatialvae_tpu.kernels.fused_loss_int8 import padded_hw

            hw_p = padded_hw(hw)
            if hw_p != hw:
                fill = -128 if yt.dtype == jnp.int8 else 0
                yt = jnp.pad(yt, ((0, 0), (0, 0), (0, hw_p - hw)),
                             constant_values=fill)
        # key by id, keep the source array alive in the value so the id
        # cannot be recycled while the entry exists
        self._cache_put(cache, id(y), (y, yt))
        return yt

    def _dataset_yq8(self, dataset):
        """(N, n) int8 + (1,1) scale encoder-input copy of dataset.y,
        quantized ONCE per dataset (training images are constants) so the
        hot loop gathers 4x less and spends no per-step activation-quant
        pass on the encoder's first layer."""
        y = dataset.y
        cache = getattr(self, "_yq8_cache", None)
        if cache is None:
            cache = self._yq8_cache = {}
        hit = cache.get(id(y))
        if hit is not None and hit[0] is y:
            return hit[1]

        entry = _quantize_dataset(jnp.asarray(y))
        self._cache_put(cache, id(y), (y, entry))
        return entry

    def _wants_yq8(self, dataset) -> bool:
        return (self._use_qenc and not self.tcfg.augment_rotation
                and dataset.ctf is None)

    def _wants_yt(self, dataset) -> bool:
        """True iff the epoch scan's steps will take the fused int8
        loss-kernel path (so a pre-transposed target copy pays off).
        The pixel mask rides the kernel (round 4); CTF still falls back."""
        from spatialvae_tpu.objectives.elbo import fused_loss_active

        if dataset.ctf is not None:
            return False
        b = self.tcfg.minibatch_size
        hw = self.coords.shape[0]
        if self._spmd or self._spmd_pixel:
            b //= self.mesh.shape["data"]
        if self._spmd_pixel:
            hw //= self.mesh.shape["model"]
        return fused_loss_active(self.ecfg, self.p_cfg, hw, b)

    def train_epoch(self, dataset, epoch: int, *, progress: bool = True,
                    progress_stream=None) -> Tuple[float, float, float]:
        """One training epoch; returns (elbo, gen_loss, kl) streaming means."""
        import time

        t_start = time.perf_counter()
        n = len(dataset)
        tcfg = self.tcfg
        z_scale = jnp.asarray(0.0 if epoch < tcfg.z_delay else 1.0,
                              dtype=jnp.float32)
        shuffle_key = jax.random.fold_in(self.base_key, 2 * epoch)
        step_key = jax.random.fold_in(self.base_key, 2 * epoch + 1)
        perm = jax.random.permutation(shuffle_key, n)
        full_idx, tail_idx, num_full, tail = self._index_batches(n, perm)

        state = self._seeded_state()
        metrics = None
        tail_metrics = None
        if getattr(dataset, "host_resident", False):
            # --no-preload: stream one minibatch per step from host RAM;
            # async dispatch overlaps the next H2D copy with compute.
            # Steps already dispatch individually here, so the reference's
            # per-minibatch progress line (train_mnist.py:166-168) is
            # emitted for real — with a one-step lag so reading the metrics
            # never blocks the step just dispatched.
            stream = progress_stream or sys.stderr
            live = StreamingMeans()
            prev_aux = None
            perm_np = np.asarray(perm)
            rows = []
            # the y_t/y_q8 dataset copies are deliberately NOT built here:
            # --no-preload exists to keep HBM at one-minibatch scale, and
            # per-batch substitutes don't pay — a host-side transpose is
            # slower than the in-graph one it would replace, and a
            # per-BATCH quant scale would make streamed int8 numerics
            # diverge from the preloaded per-DATASET scale.  Streamed
            # steps take the in-graph transpose/quant path (perf-only).
            # derive per-step keys by the SAME split chain the preloaded
            # scan's body uses (k, sub = split(k) each step), so streamed
            # and preloaded runs share one trajectory — same batches AND
            # same reparameterisation noise (residual differences are XLA
            # fusion reassociation only)
            step_keys = _split_chain(step_key, num_full) if num_full else None
            for i in range(num_full):
                # same within-batch sort as _index_batches (host-side it
                # also makes the numpy fancy-index read sequential)
                idx = np.sort(perm_np[i * tcfg.minibatch_size:
                                      (i + 1) * tcfg.minibatch_size])
                y = jnp.asarray(dataset.y[idx])
                ctf = (None if dataset.ctf is None
                       else jnp.asarray(dataset.ctf[idx]))
                state, aux = self._train_step(state, y, ctf, step_keys[i],
                                              z_scale)
                rows.append(aux)
                if progress and prev_aux is not None:
                    live.update(tcfg.minibatch_size,
                                *[float(v) for v in np.asarray(prev_aux)])
                    print(live.progress_line(epoch, tcfg.num_epochs, n),
                          end="\r", file=stream)
                prev_aux = aux
            if rows:
                metrics = jnp.stack(rows)
            if tail:
                idx = perm_np[num_full * tcfg.minibatch_size:]
                y = jnp.asarray(dataset.y[idx])
                ctf = (None if dataset.ctf is None
                       else jnp.asarray(dataset.ctf[idx]))
                k_tail = jax.random.fold_in(step_key, num_full)
                if self._spmd_pixel or (self._spmd and
                                        tail % self.mesh.shape["data"] != 0):
                    # same routing as the preloaded branch below: the
                    # shard_map step's P('data') in_specs cannot take a
                    # batch that does not divide the data axis — train it
                    # through the replicated plain step instead
                    state, tail_metrics = self._tail_step(state, y, ctf,
                                                          k_tail, z_scale)
                else:
                    state, tail_metrics = self._train_step(state, y, ctf,
                                                           k_tail, z_scale)
        else:
            if num_full:
                data_t = (self._dataset_yt(dataset) if self._wants_yt(dataset)
                          else None)
                data_q8 = (self._dataset_yq8(dataset)
                           if self._wants_yq8(dataset) else None)
                state, metrics = self._train_epoch_scan(
                    state, dataset.y, data_t, dataset.ctf, data_q8,
                    full_idx, step_key, z_scale)
            if tail and (self._spmd_pixel
                         or (self._spmd
                             and tail % self.mesh.shape["data"] != 0)):
                # the shard_map step can't take this batch — train it
                # through the replicated plain step instead of dropping it
                k_tail = jax.random.fold_in(step_key, num_full)
                y = dataset.y[tail_idx]
                ctf = None if dataset.ctf is None else dataset.ctf[tail_idx]
                state, tail_metrics = self._tail_step(state, y, ctf,
                                                      k_tail, z_scale)
            elif tail:
                k_tail = jax.random.fold_in(step_key, num_full)
                y = dataset.y[tail_idx]
                ctf = None if dataset.ctf is None else dataset.ctf[tail_idx]
                state, tail_metrics = self._train_step(state, y, ctf,
                                                       k_tail, z_scale)
        self.state = state

        acc = StreamingMeans()
        if metrics is not None:
            m = np.asarray(metrics)
            _warn_nonfinite(m, epoch)
            acc.update_array(m, tcfg.minibatch_size)
        if tail_metrics is not None:
            tm = np.asarray(tail_metrics)
            # the tail may be the ONLY batch (n < minibatch_size) — it
            # deserves the same divergence diagnostic as the scan path,
            # reported at its true position (step num_full + 1)
            _warn_nonfinite(tm.reshape(1, -1), epoch, step_base=num_full)
            acc.update(tail, *[float(v) for v in tm])
        if progress:
            # the epoch runs as one scan, so the summary line lands once,
            # complete, and stays visible (the reference's per-minibatch \r
            # line ends in the same state; train_mnist.py:166-168)
            stream = progress_stream or sys.stderr
            line = acc.progress_line(epoch, tcfg.num_epochs, n)
            print(line, file=stream)
        # throughput observability (the north-star metric, SURVEY.md 5.1);
        # epoch 0 includes compile time, later epochs are steady-state
        dt = time.perf_counter() - t_start
        self.last_images_per_sec = n / dt if dt > 0 else 0.0
        return acc.elbo, acc.gen_loss, acc.kl

    def train_epochs(self, dataset, first_epoch: int, num_epochs: int):
        """Train ``num_epochs`` consecutive epochs in ONE device dispatch
        (outer lax.scan over epochs, inner over batches — permutations,
        step keys and the z-delay curriculum derive in-graph).

        Removes the per-epoch host round-trip of train_epoch (dispatch
        latency through the tunnel + metric fetch + python bookkeeping,
        measured ~65 ms/epoch at bench scale) — the steady-state path for
        long runs and bench.py.  RNG derivation matches train_epoch, so
        the trajectory is bit-identical to calling it sequentially.

        Returns a (num_epochs, 3) array of per-epoch (elbo, gen_loss, kl)
        means.  Falls back to sequential train_epoch calls when the
        dataset streams from host RAM or has a trailing partial batch."""
        import time

        n = len(dataset)
        b = self.tcfg.minibatch_size
        if num_epochs <= 0:
            return np.zeros((0, 3), np.float64)
        if getattr(dataset, "host_resident", False) or n % b or n < b:
            rows = [self.train_epoch(dataset, e, progress=False)
                    for e in range(first_epoch, first_epoch + num_epochs)]
            return np.asarray(rows, np.float64)

        t_start = time.perf_counter()
        state = self._seeded_state()
        data_t = (self._dataset_yt(dataset) if self._wants_yt(dataset)
                  else None)
        data_q8 = (self._dataset_yq8(dataset)
                   if self._wants_yq8(dataset) else None)
        state, metrics = self._train_epochs_scan(
            state, dataset.y, data_t, dataset.ctf, data_q8,
            self.base_key, jnp.asarray(first_epoch, jnp.int32),
            jnp.asarray(self.tcfg.z_delay, jnp.int32), num_epochs, n)
        self.state = state
        m = np.asarray(metrics)                      # (E, num_batches, 3)
        _warn_nonfinite(m, first_epoch)
        dt = time.perf_counter() - t_start
        self.last_images_per_sec = (num_epochs * n / dt) if dt > 0 else 0.0
        # equal batch sizes -> per-epoch streaming means are plain means;
        # float64 to match the fallback path's dtype
        return m.astype(np.float64).mean(axis=1)

    def _seeded_state(self):
        """TrainState with the bf16 shadow / int8 qshadow seeded (idempotent
        — subsequent steps carry them out of the Adam pass)."""
        state = self.state
        if self._use_shadow and state.shadow is None:
            state = state._replace(
                shadow=_cast_tree(state.params, self._compute_dtype))
        if self._use_qenc and state.qshadow is None:
            from spatialvae_tpu.train.optimizer_pallas import quantize_leaf

            state = state._replace(qshadow=jax.tree_util.tree_map(
                lambda p: quantize_leaf(
                    p, p.ndim == 2 and p.size >= _QENC_MIN_ELEMS),
                state.params))
        return state

    def eval_epoch(self, dataset, epoch: int, *, z_scale: float = 1.0
                   ) -> Tuple[float, float, float]:
        n = len(dataset)
        key = jax.random.fold_in(self.base_key, 1_000_000_007 + epoch)
        full_idx, tail_idx, num_full, tail = self._index_batches(n, None)
        zs = jnp.asarray(z_scale, dtype=jnp.float32)
        acc = StreamingMeans()
        b = self.tcfg.minibatch_size
        if getattr(dataset, "host_resident", False):
            # same split chain as eval_epoch_scan's body (k, sub = split(k))
            # so streamed and preloaded evals draw identical noise — the
            # training path was unified the same way (_split_chain)
            step_keys = _split_chain(key, num_full) if num_full else None
            for i in range(num_full):
                y = jnp.asarray(dataset.y[i * b:(i + 1) * b])
                ctf = (None if dataset.ctf is None
                       else jnp.asarray(dataset.ctf[i * b:(i + 1) * b]))
                m = self._eval_step(self.state.params, y, ctf,
                                    step_keys[i], zs)
                acc.update(b, *[float(v) for v in np.asarray(m)])
        elif num_full:
            # eval runs without the fused LOSS kernel (see _nonstep_ecfg),
            # so the pre-transposed target copy has no consumer
            metrics = self._eval_epoch_scan(self.state.params, dataset.y,
                                            None, dataset.ctf, full_idx,
                                            key, zs)
            acc.update_array(np.asarray(metrics), b)
        if tail:
            k_tail = jax.random.fold_in(key, num_full)
            y = jnp.asarray(dataset.y[num_full * b:])
            ctf = (None if dataset.ctf is None
                   else jnp.asarray(dataset.ctf[num_full * b:]))
            m = self._eval_step(self.state.params, y, ctf, k_tail, zs)
            acc.update(tail, *[float(v) for v in np.asarray(m)])
        return acc.elbo, acc.gen_loss, acc.kl

    # --------------------------------------------------------- display paths
    def reconstruct(self, y: jax.Array, key: Optional[jax.Array] = None,
                    z_scale: float = 1.0) -> jax.Array:
        """Posterior-sample reconstruction (the {E}_{label}.png dump)."""
        key = key if key is not None else jax.random.fold_in(self.base_key, 7)
        _, _, _, y_hat = elbo_minibatch(
            self.state.params["q"], self.state.params["p"], self.q_cfg,
            self.p_cfg, self._nonstep_ecfg, self.coords, y, key,
            z_scale=z_scale,
            mask=None, image_shape=self.tcfg.image_shape, want_y_hat=True)
        return y_hat

    def reconstruct_canonical(self, y: jax.Array,
                              key: Optional[jax.Array] = None,
                              z_scale: float = 1.0) -> jax.Array:
        """Pose-stripped reconstruction — rotation/translation latents are
        dropped before decoding over the untransformed grid
        (train_mnist.py:93-124 minibatch_for_display)."""
        b = y.shape[0]
        key = key if key is not None else jax.random.fold_in(self.base_key, 8)
        q_params, p_params = self.state.params["q"], self.state.params["p"]
        z_mu, z_logstd = inference_apply(q_params, self.q_cfg,
                                         y.reshape(b, -1))
        r = jax.random.normal(key, z_mu.shape, dtype=z_mu.dtype)
        z = jnp.exp(z_logstd) * r + z_mu
        if not self.ecfg.vanilla:
            if self.ecfg.rotate:
                z = z[:, 1:]
            if self.ecfg.translate:
                z = z[:, 2:]
        z = z * z_scale
        if self.ecfg.vanilla:
            return vanilla_generator_apply(p_params, self.p_cfg, None, z)
        x = jnp.broadcast_to(self.coords[None], (b,) + self.coords.shape)
        return spatial_generator_apply(p_params, self.p_cfg, x, z)

    def sample_prior(self, batch_size: int, z_dim: int,
                     key: Optional[jax.Array] = None,
                     z_scale: float = 1.0) -> jax.Array:
        """Decode z ~ N(0, 1) (train_galaxy.py:166-183)."""
        key = key if key is not None else jax.random.fold_in(self.base_key, 9)
        z = jax.random.normal(key, (batch_size, z_dim)) * z_scale
        p_params = self.state.params["p"]
        if self.ecfg.vanilla:
            return vanilla_generator_apply(p_params, self.p_cfg, None, z)
        x = jnp.broadcast_to(self.coords[None],
                             (batch_size,) + self.coords.shape)
        return spatial_generator_apply(p_params, self.p_cfg, x, z)
