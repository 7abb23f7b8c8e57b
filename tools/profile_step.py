#!/usr/bin/env python
"""Profile the real bench training step and print the per-op time split.

Runs the bench workload (galaxy 64px z=20) for one warmup epoch, traces one
epoch with jax.profiler, and aggregates the device 'X' events by op name —
the only trustworthy per-op decomposition on this tunnel (single-dispatch
timing adds ~10 ms per call).

Usage: python tools/profile_step.py [batch=2048] [steps=8]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# measurement entry point: off-default kernel knobs are allowed
from spatialvae_tpu.kernels.config import allow_knobs
allow_knobs()

import numpy as np


def main():
    batch = 2048
    steps = 8
    for a in sys.argv[1:]:
        k, v = a.split("=")
        if k == "batch":
            batch = int(v)
        elif k == "steps":
            steps = int(v)

    import jax
    import jax.numpy as jnp

    from spatialvae_tpu.core.cache import enable_compilation_cache
    from spatialvae_tpu.core.config import (
        InferenceConfig,
        SpatialGeneratorConfig,
    )
    from spatialvae_tpu.data import ArrayDataset
    from spatialvae_tpu.objectives import ElboConfig
    from spatialvae_tpu.train import Trainer, TrainConfig
    from spatialvae_tpu.transforms.coords import coord_grid

    enable_compilation_cache()
    n = m = 64
    channels = 3
    z_dim = 20
    q_cfg = InferenceConfig(n=n * m * channels, latent_dim=z_dim + 3,
                            hidden_dim=5000, num_layers=2)
    p_cfg = SpatialGeneratorConfig(latent_dim=z_dim, hidden_dim=500,
                                   n_out=channels, num_layers=2)
    ecfg = ElboConfig(rotate=True, translate=True, theta_prior=np.pi,
                      likelihood="bernoulli", channels=channels, fused=True,
                      int8=True)
    tcfg = TrainConfig(minibatch_size=batch, learning_rate=1e-4,
                       num_epochs=3, seed=0, compute_dtype="bfloat16",
                       image_shape=(n, m), channels=channels)
    trainer = Trainer(q_cfg, p_cfg, ecfg, tcfg, coord_grid(n, m))
    y = jax.random.uniform(jax.random.PRNGKey(0),
                           (batch * steps, n * m, channels),
                           dtype=jnp.float32)
    dataset = ArrayDataset(y)
    trainer.train_epoch(dataset, 0, progress=False)      # warmup/compile

    outdir = "/tmp/spatialvae_profile"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        trainer.train_epoch(dataset, 1, progress=False)

    traces = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
    assert traces, f"no trace written under {outdir}"
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)

    # keep only device-lane complete events
    by_op = defaultdict(float)
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        if name.startswith(("process_", "thread_", "Steal", "$")):
            continue
        args = ev.get("args") or {}
        # device events carry run_id/program metadata; host lanes don't
        if "run_id" not in args and "program_id" not in args \
                and "long_name" not in args:
            continue
        dur = float(ev.get("dur", 0.0))
        by_op[name] += dur
        total += dur

    # remember one long_name per op for provenance of the anonymous fusions
    long_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        ln = args.get("long_name")
        if ln and ev.get("name") not in long_names:
            long_names[ev["name"]] = ln

    print(f"# total device time {total / 1e3:.1f} ms over {steps} steps "
          f"({total / 1e3 / steps:.2f} ms/step)")
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:25]:
        ln = long_names.get(name, "")
        print(f"{dur / 1e3 / steps:8.3f} ms/step  {name[:60]}"
              f"  {ln[:160]}")


if __name__ == "__main__":
    main()
