"""Device mesh configuration.

The reference is single-process single-device (SURVEY.md section 2.4); the
TPU build supplies parallelism from scratch:

- axis 'data': data parallelism — the batch is sharded across chips; XLA
  all-reduces gradients over ICI automatically.
- axis 'model': a second axis used two ways (the spatial-VAE analogue of
  tensor/sequence parallelism):
    * the encoder's first-layer weight (n_pixels*C, H) — by far the largest
      parameter (galaxy: 12288x5000 = 61M) — is column-sharded over 'model';
    * the decoder's (B, HW, H) hidden activations are sharded over 'model'
      along the pixel axis (pixels are conditionally independent given z, so
      this "sequence parallelism" needs only the loss-sum all-reduce —
      strictly cheaper than ring attention; SURVEY.md section 5.7).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh


@dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    model: int = 1

    @staticmethod
    def auto(n_devices: int | None = None, model: int = 1) -> "MeshConfig":
        n = n_devices or len(jax.devices())
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        return MeshConfig(data=n // model, model=model)


def create_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    n = cfg.data * cfg.model
    if devices is None and n == len(jax.devices()):
        # ICI-topology-aware ordering: on a real TPU slice mesh_utils
        # aligns the high-traffic 'data' all-reduce axis with ICI rings
        # (a naive enumeration-order reshape can route gradient
        # all-reduces across slow links); on CPU/fake devices it falls
        # back to enumeration order, so tests see the same mesh
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_device_mesh((cfg.data, cfg.model))
            return Mesh(arr, axis_names=("data", "model"))
        except Exception:
            pass  # unusual topology mesh_utils can't factor — naive order
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n, (
        f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(cfg.data, cfg.model)
    return Mesh(arr, axis_names=("data", "model"))


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None) -> None:
    """Join a multi-host TPU slice (jax.distributed).

    On Cloud TPU pods the arguments are auto-detected from the environment;
    pass them explicitly elsewhere.  After this, ``jax.devices()`` spans the
    slice and ``create_mesh`` lays the ('data', 'model') axes over ICI.
    Collectives are emitted by GSPMD from the sharding annotations — there
    is no hand-written communication layer (SURVEY.md section 5.8).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
