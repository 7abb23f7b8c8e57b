#!/usr/bin/env python
"""Measure the ACTUAL PyTorch reference's training throughput (BASELINE.md
to-do #2: context for the speedup claim) on the hardware available here —
CPU, since this image has no CUDA and the reference cannot target TPUs.

Drives /root/reference/train_galaxy.py's real train_epoch (eval_minibatch +
backward + Adam) at the flagship galaxy configuration (64x64 RGB, z=20,
q_hidden=5000, p 500x2) on synthetic data, and times steady-state steps.
For an apples-to-apples hardware-normalized point it also times OUR
framework's train step on the same CPU (XLA path, f32).

Usage: python tools/reference_throughput.py [batch=100] [steps=6]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def _import_reference():
    # stub machinery shared with tests/test_reference_parity.py
    from tests.reference_stub import import_reference_modules

    _, _, _, ref_galaxy = import_reference_modules()
    return ref_galaxy


def time_reference(batch: int, steps: int) -> float:
    import numpy as np
    import torch
    import torch.utils.data

    ref = _import_reference()
    sys.path.insert(0, REF)
    from spatial_vae.models import InferenceNetwork, SpatialGenerator

    n = m = 64
    C = 3
    z_dim = 20
    torch.manual_seed(0)
    inf_dim = z_dim + 3
    q_net = InferenceNetwork(n * m * C, inf_dim, 5000, num_layers=2)
    p_net = SpatialGenerator(z_dim, 500, n_out=C, num_layers=2)

    xgrid = np.linspace(-1, 1, m)
    ygrid = np.linspace(1, -1, n)
    x0, x1 = np.meshgrid(xgrid, ygrid)
    x_coord = np.stack([x0.ravel(), x1.ravel()], 1).astype(np.float32)
    x_coord = torch.from_numpy(x_coord)

    y = torch.rand(batch * (steps + 2), n * m, C)
    data = torch.utils.data.TensorDataset(y)
    iterator = torch.utils.data.DataLoader(data, batch_size=batch,
                                           shuffle=False)
    optim = torch.optim.Adam(list(p_net.parameters())
                             + list(q_net.parameters()), lr=1e-4)

    times = []
    for i, (yb,) in enumerate(iterator):
        t0 = time.perf_counter()
        # the reference's per-minibatch body (train_galaxy.py train_epoch):
        # eval_minibatch -> backward -> step -> zero_grad -> .item() syncs
        elbo, log_p, kl, _ = ref.eval_minibatch(
            x_coord, yb, p_net, q_net, rotate=True, translate=True,
            dx_scale=0.1, theta_prior=np.pi, z_scale=1.0, use_cuda=False)
        loss = -elbo
        loss.backward()
        optim.step()
        optim.zero_grad()
        _ = (elbo.item(), log_p.item(), kl.item())
        times.append(time.perf_counter() - t0)
    steady = times[2:]
    dt = sum(steady) / len(steady)
    print(f"reference torch-CPU: batch={batch} step={dt * 1e3:.0f} ms "
          f"({batch / dt:.1f} img/s)")
    return batch / dt


def time_ours_cpu(batch: int, steps: int) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from spatialvae_tpu.core.config import (
        InferenceConfig,
        SpatialGeneratorConfig,
    )
    from spatialvae_tpu.data import ArrayDataset
    from spatialvae_tpu.objectives import ElboConfig
    from spatialvae_tpu.train import Trainer, TrainConfig
    from spatialvae_tpu.transforms.coords import coord_grid

    n = m = 64
    C = 3
    q_cfg = InferenceConfig(n=n * m * C, latent_dim=23, hidden_dim=5000,
                            num_layers=2)
    p_cfg = SpatialGeneratorConfig(latent_dim=20, hidden_dim=500,
                                   n_out=C, num_layers=2)
    ecfg = ElboConfig(rotate=True, translate=True, theta_prior=np.pi,
                      likelihood="bernoulli", channels=C)
    tcfg = TrainConfig(minibatch_size=batch, num_epochs=1, seed=0,
                       image_shape=(n, m), channels=C)
    t = Trainer(q_cfg, p_cfg, ecfg, tcfg, coord_grid(n, m))
    data = ArrayDataset(jax.random.uniform(jax.random.PRNGKey(0),
                                           (batch * steps, n * m, C)))
    t.train_epoch(data, 0, progress=False)           # compile
    t0 = time.perf_counter()
    t.train_epoch(data, 1, progress=False)
    dt = (time.perf_counter() - t0) / steps
    print(f"ours jax-CPU (XLA path, f32): batch={batch} "
          f"step={dt * 1e3:.0f} ms ({batch / dt:.1f} img/s)")
    return batch / dt


def main():
    batch, steps = 100, 6
    for a in sys.argv[1:]:
        k, v = a.split("=")
        if k == "batch":
            batch = int(v)
        elif k == "steps":
            steps = int(v)
    which = os.environ.get("REFBENCH", "both")
    if which in ("ref", "both"):
        time_reference(batch, steps)
    if which in ("ours", "both"):
        time_ours_cpu(batch, steps)


if __name__ == "__main__":
    main()
