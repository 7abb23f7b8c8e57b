#!/usr/bin/env python
"""Training-throughput benchmark on the flagship workload.

Workload: galaxy_zoo configuration (BASELINE.json north star) — 64x64 RGB
images, z=20, SpatialGenerator p (500 wide, 2 layers), InferenceNetwork q
(5000 wide, 2 layers) — full training step (forward ELBO + backward + Adam)
in bfloat16 compute with float32 optimizer state, driven as one lax.scan
epoch over an in-HBM dataset (zero per-step host round-trips).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 50_000 (the driver-set north-star img/s/chip target;
the reference publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


# measurement entry point: off-default kernel knobs are allowed
from spatialvae_tpu.kernels.config import allow_knobs
allow_knobs()


def run_bench(batch: int, fused: bool, epochs: int = 3,
              steps_per_epoch: int = 16, int8: bool = False,
              config: str = "galaxy") -> float:
    import jax
    import jax.numpy as jnp

    from spatialvae_tpu.core.config import (
        InferenceConfig,
        SpatialGeneratorConfig,
    )
    from spatialvae_tpu.data import ArrayDataset
    from spatialvae_tpu.objectives import ElboConfig
    from spatialvae_tpu.train import Trainer, TrainConfig
    from spatialvae_tpu.transforms.coords import coord_grid

    # 'mnist' = BASELINE.json config #1 shape (28x28 grayscale, z=2,
    # 500-wide p/q): hw=784 is NOT tile-aligned — the kernel runs it via
    # the round-5 zero-padding (784 -> 1024), so this arm measures the
    # padded kernel against its own bf16/XLA fallback.
    n = m = 28 if config == "mnist" else 64
    # 'particles' = the cryo-EM workload (BASELINE.json configs #3/#4
    # minus CTF): grayscale, gaussian likelihood, circular pixel mask —
    # rides the gaussian-family fused kernel since round 4.
    # 'colored' = particles --fit-noise (reference train_particles.py
    # likelihood with learned per-pixel variance, n_out=2 interleaved
    # mu/logvar).  Rides the fused loss kernel since round 5 via chunk-
    # permuted coords (kernels/fused_loss_int8.py module docstring):
    # 43.6k img/s at B=2048 vs 31.3k on the XLA decode-then-loss path it
    # replaced (BASELINE.md round 5).
    channels = 1 if config in ("particles", "colored", "mnist") else 3
    z_dim = 2 if config == "mnist" else 20
    n_images = batch * steps_per_epoch

    inf_dim = z_dim + 3
    q_cfg = InferenceConfig(n=n * m * channels, latent_dim=inf_dim,
                            hidden_dim=500 if config == "mnist" else 5000,
                            num_layers=2)
    n_out = 2 if config == "colored" else channels
    p_cfg = SpatialGeneratorConfig(latent_dim=z_dim, hidden_dim=500,
                                   n_out=n_out, num_layers=2)
    likelihood = {"particles": "gaussian", "colored": "colored"}.get(
        config, "bernoulli")
    ecfg = ElboConfig(rotate=True, translate=True,
                      theta_prior=np.pi / 4 if config == "mnist" else np.pi,
                      theta_mean_penalty=config == "mnist",
                      likelihood=likelihood,
                      channels=channels, fused=fused, int8=int8)
    tcfg = TrainConfig(minibatch_size=batch, learning_rate=1e-4,
                       num_epochs=3, seed=0, compute_dtype="bfloat16",
                       image_shape=(n, m), channels=channels)
    grid = coord_grid(n, m)
    mask = None
    if config in ("particles", "colored"):
        mask = (np.sum(np.asarray(grid) ** 2, axis=1)
                <= 1.0).astype(np.float32)
    trainer = Trainer(q_cfg, p_cfg, ecfg, tcfg, grid, mask=mask)

    key = jax.random.PRNGKey(0)
    y = jax.random.uniform(key, (n_images, n * m, channels),
                           dtype=jnp.float32)
    if int8 and config in ("galaxy", "mnist"):
        # real galaxy/mnist data is PNG-decoded uint8 / 255
        # (train_galaxy.py:386-387) — generate on the same /255 grid so
        # the trainer's int8-target detection engages (trainer._dataset_yt
        # stores y_t as exact int8, HALF the per-step gather bytes of
        # bf16).  On the full int8 path the f32 image gather itself is
        # dead code (y_t + y_q8 carry everything); the f32 copy only
        # costs HBM capacity — at N=131072 (B=8192) f32+int8+int8 ≈
        # 9.6 GB, inside the 16 GB that the old f32+bf16+bf16 trio blew
        # (commit 874ad9f).
        y = jnp.round(y * 255.0) / 255.0
    dataset = ArrayDataset(y)

    # warmup/compile with the SAME static epoch count the timed run uses
    # (train_epochs scans epochs in-graph — one dispatch for the whole
    # run, no per-epoch host round-trip)
    t0 = time.perf_counter()
    trainer.train_epochs(dataset, 0, epochs)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    trainer.train_epochs(dataset, epochs, epochs)
    dt = time.perf_counter() - t0

    images_per_sec = epochs * n_images / dt
    # the warmup interval contains compile AND one full epochs-run of
    # training (train_epochs is a single dispatch — there is no way to
    # compile without running), so label it honestly
    print(f"# fused={fused} int8={int8} batch={batch} "
          f"steps/epoch={steps_per_epoch} "
          f"epochs={epochs} warmup(compile+run)={compile_s:.1f}s "
          f"wall={dt:.2f}s "
          f"step={dt / (epochs * steps_per_epoch) * 1e3:.1f}ms",
          file=sys.stderr)
    return images_per_sec


def main():
    import os

    import jax

    from spatialvae_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    # B=4096 amortises the fixed per-step cost (Adam + encoder tails) over
    # twice the images: 33.2k vs 32.3k img/s at B=2048 (BASELINE.md table)
    batch = 4096
    fused = jax.default_backend() == "tpu"
    compare = False
    # int8 decoder GEMMs by default: validated to track the bf16 ELBO
    # trajectory within 0.01%/epoch on the galaxy config (BASELINE.md);
    # --no-int8 falls back to the parity-exact bf16 fused path
    int8 = fused
    steps = 16
    config = "galaxy"
    for a in sys.argv[1:]:
        if a == "--no-fused":
            fused = False
            int8 = False
        elif a == "--compare":
            compare = True
        elif a == "--int8":
            int8 = True
        elif a == "--no-int8":
            int8 = False
        elif a.startswith("steps="):
            steps = int(a.split("=", 1)[1])
        elif a.startswith("config="):
            config = a.split("=", 1)[1]
        else:
            batch = int(a)

    if compare:
        xla = run_bench(batch, fused=False, steps_per_epoch=steps,
                        config=config)
        print(f"# XLA path: {xla:.0f} img/s", file=sys.stderr)
    if int8:
        # bf16 Adam-moment storage (f32 arithmetic): +0.65% at B=4096,
        # horizon-gated with the rest of the int8 quality levers (max gap
        # 0.135%/final 0.036% — identical to the f32-moment stack); the
        # bf16 parity path keeps f32 moments (set AFTER the --compare arm
        # so the XLA/bf16 reference run stays untouched)
        os.environ.setdefault("SPATIALVAE_ADAM_MOMENTS", "bf16")
    images_per_sec = run_bench(batch, fused=fused, int8=int8,
                               steps_per_epoch=steps, config=config)

    mode = "int8" if int8 else "bf16"
    name = {"particles": "particles 64px z=20 gaussian+mask",
            "colored": "particles 64px z=20 fit-noise+mask",
            "mnist": "mnist 28px z=2 (hw padded 784->1024)",
            }.get(config, "galaxy_zoo 64px z=20")
    result = {
        "metric": f"train images/sec/chip ({name}, {mode})",
        "value": round(images_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / 50_000.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
