"""The ONE definition of the fused-kernel configuration knobs.

Every measurement lever the kernels expose (`SPATIALVAE_*` env vars used by
tools/kernel_bench.py, tools/ablate.py, bench.py A/B runs) is collected
into a single frozen ``KernelConfig`` whose field defaults ARE the measured
performance/quality plateau (CLAUDE.md rounds 2-4).  The kernel modules
resolve their knobs exclusively through ``KernelConfig.from_env()`` —
scattered ``os.environ.get`` defaults can silently drift apart; one
dataclass cannot.

Production guard: several knobs change NUMERICS, not just speed (stochastic
rounding, the Padé tanh, the epilogue dtype, the int4 gradient stack...).
A stray env var must not silently alter training, so ``Trainer`` calls
``check_numerics_default()`` at construction: it raises when a
numerics-changing knob is off its validated default unless the process
opted in via ``SPATIALVAE_ALLOW_KNOBS=1`` — which only the measurement
entry points (tools/*, bench.py) set.

Reference scope note: the reference (single-GPU torch) has no kernel
configuration surface; every knob here is a TPU-native measurement lever.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, fields
from typing import Optional


def _env_int(name: str, default: Optional[int]) -> Optional[int]:
    v = os.environ.get(name)
    if v is None or not v.strip():
        return default
    try:
        return int(v)
    except ValueError:
        raise ValueError(f"{name} must be an integer, got {v!r}")


def _env_choice(name: str, default: str, choices) -> str:
    v = os.environ.get(name, default)
    if v not in choices:
        raise ValueError(f"{name} must be one of {sorted(choices)}, "
                         f"got {v!r}")
    return v


def _env_flag(name: str, default: bool = False) -> bool:
    return os.environ.get(name, "1" if default else "0") == "1"


# fields that change training NUMERICS when moved off their default (the
# int4/scale/rounding/activation levers); perf-only fields (pipe depth,
# tile size, VMEM cap, MXU-vs-VPU build — float-assoc only) are exempt,
# and `interpret` is the test mechanism itself.
NUMERICS_FIELDS = ("grad_mode", "gscale", "epi", "tanh", "sr", "a1q",
                   "db1", "phase_cut", "layout", "grad_mode_t",
                   "adam_emit")


@dataclass(frozen=True)
class KernelConfig:
    """Fused-kernel knobs; defaults = the measured round-2/3/4 plateau."""

    # ---- perf-only ------------------------------------------------------
    # images per grid step: depth 8 is the bound/i4dw1 plateau (40.3 ms vs
    # 42.0 at depth 4, B=2048); the kernel clamps to the largest pow-2
    # divisor of the batch <= this
    pipe_imgs: int = 8
    # pixel-tile size; None = auto (1024 if it divides HW, else 512/256)
    loss_tile: Optional[int] = None
    # scoped-VMEM cap override in MB; None = the measured per-shape default
    vmem_override_mb: Optional[int] = None
    # first-layer build on the MXU instead of the VPU broadcast chain
    # (measured slower, 60.8 vs 58.8 ms; float-assoc difference only)
    mxu_build: bool = False

    # ---- numerics-changing (see NUMERICS_FIELDS) -------------------------
    # gradient-GEMM precision: 'i8' | 'da0_i4' | 'i4fwd' | 'i4dw1'
    # (i4dw1 = int4 fwd + int4 da0 + transposed int4 dw1 — the round-3
    # default, horizon-gated)
    grad_mode: str = "i4dw1"
    # gradient-quant scale engine: 'tile' | 'bound' (analytic bound,
    # round-3 default — collapses p5 to one pass)
    gscale: str = "bound"
    # epilogue elementwise dtype: 'bf16' | 'f32'
    epi: str = "bf16"
    # tanh engine: 'exact' (native VPU op) | 'pade' (measured 63.2 vs
    # 48.5 ms — kept as a recorded negative)
    tanh: str = "exact"
    # stochastic rounding of the quant sites (quality lever, +5.7 ms)
    sr: bool = False
    # int8 hidden activation (measured slower — relayout-bound; kept for
    # future Mosaic releases)
    a1q: bool = False
    # db1 source: 'chain' (pre-round sum) | 'qi' (post-round int tile)
    db1: str = "chain"
    # measurement ladder: run only phases 1..k (8 = full kernel)
    phase_cut: int = 8
    # kernel layout: 'row' | 't' (feature-major experiment, measured
    # slower; bernoulli-only)
    layout: str = "row"
    # transposed-kernel gradient mode ('i8' | 'i4'), _t layout only
    grad_mode_t: str = "i4"
    # int8-encoder-weight emission engine: 'xla' (default) = fresh-scale
    # XLA Adam + separate clamp_convert emission pass (the round-4 stack)
    # | 'pallas' = the single-pass Adam+emit kernel
    # (optimizer_pallas._adam_emit_leaf; quant scale one step stale).
    # MEASURED NEGATIVE (round 5, bench B=4096): pallas 100.1 ms/step
    # (40.9k img/s) vs xla 94.9 (43.2k) — same class as the round-2
    # per-leaf Pallas Adam loss (Mosaic buys nothing on HBM-bound
    # elementwise, and the mid-while-body pallas_calls forfeit XLA's
    # fusion/overlap around them).  Kept env-gated as the measured record;
    # numerically verified on TPU (m/v exact, p' 1 ulp, abs-max exact).
    adam_emit: str = "xla"
    # _t-kernel pipeline depth: its OWN default is 4 (its recorded numbers
    # are depth-4 and it has the largest per-image transients — inheriting
    # the row kernel's depth-8 would silently A/B an unmeasured, likely
    # VMEM-starved configuration); an explicit SPATIALVAE_PIPE_IMGS
    # override applies to both kernels
    pipe_imgs_t: int = 4

    # ---- test mechanism ---------------------------------------------------
    # per-call interpret lowering (plain XLA ops; disables int4)
    interpret: bool = False

    @classmethod
    def from_env(cls) -> "KernelConfig":
        """Resolve every knob from its SPATIALVAE_* env var (validated),
        falling back to the dataclass default.  Called at trace time, so
        tools/tests that set env per-case keep working; the single source
        of the default values is this dataclass."""
        pipe = _env_int("SPATIALVAE_PIPE_IMGS", cls.pipe_imgs)
        if pipe is None or pipe < 1:
            pipe = cls.pipe_imgs
        pipe_t = _env_int("SPATIALVAE_PIPE_IMGS", cls.pipe_imgs_t)
        if pipe_t is None or pipe_t < 1:
            pipe_t = cls.pipe_imgs_t
        tile = _env_int("SPATIALVAE_LOSS_TILE", cls.loss_tile)
        if tile is not None and tile <= 0:
            tile = None           # typo'd 0: auto, not ZeroDivisionError
        return cls(
            pipe_imgs=pipe,
            loss_tile=tile,
            vmem_override_mb=_env_int("SPATIALVAE_VMEM_OVERRIDE", None),
            mxu_build=_env_flag("SPATIALVAE_MXU_BUILD", cls.mxu_build),
            grad_mode=_env_choice("SPATIALVAE_INT4_GRADS", cls.grad_mode,
                                  ("i8", "da0_i4", "i4fwd", "i4dw1")),
            gscale=_env_choice("SPATIALVAE_GSCALE", cls.gscale,
                               ("tile", "bound")),
            epi=_env_choice("SPATIALVAE_EPI", cls.epi, ("bf16", "f32")),
            tanh=_env_choice("SPATIALVAE_TANH", cls.tanh,
                             ("exact", "pade")),
            sr=_env_flag("SPATIALVAE_SR", cls.sr),
            a1q=_env_flag("SPATIALVAE_A1Q", cls.a1q),
            db1=_env_choice("SPATIALVAE_DB1", cls.db1, ("chain", "qi")),
            phase_cut=_env_int("SPATIALVAE_PHASE_CUT", cls.phase_cut),
            layout=_env_choice("SPATIALVAE_LOSS_LAYOUT", cls.layout,
                               ("row", "t")),
            grad_mode_t=_env_choice("SPATIALVAE_INT4_GRADS_T",
                                    cls.grad_mode_t, ("i8", "i4")),
            adam_emit=_env_choice("SPATIALVAE_ADAM_EMIT", cls.adam_emit,
                                  ("pallas", "xla")),
            pipe_imgs_t=pipe_t,
            interpret=_env_flag("SPATIALVAE_INTERPRET", False),
        )


def allow_knobs() -> None:
    """Opt this process into off-default numerics knobs (measurement entry
    points only: tools/*, bench.py)."""
    os.environ["SPATIALVAE_ALLOW_KNOBS"] = "1"


def check_numerics_default() -> None:
    """Raise if any numerics-changing kernel knob is off its validated
    default and the process has not opted in (SPATIALVAE_ALLOW_KNOBS=1).

    Called by Trainer at construction: training runs must get the
    horizon-gated numerics stack unless a measurement harness explicitly
    asked otherwise."""
    if os.environ.get("SPATIALVAE_ALLOW_KNOBS") == "1":
        return
    cfg = KernelConfig.from_env()
    drift = [f.name for f in fields(KernelConfig)
             if f.name in NUMERICS_FIELDS
             and getattr(cfg, f.name) != f.default]
    if drift:
        raise RuntimeError(
            "numerics-changing kernel knob(s) off their validated default: "
            f"{drift}. These env overrides are measurement levers "
            "(tools/, bench.py); unset them for training, or set "
            "SPATIALVAE_ALLOW_KNOBS=1 to accept off-default numerics.")
