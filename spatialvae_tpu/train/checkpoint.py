"""Checkpoint save/load.

Filename parity with the reference (misc_tools.py:88-104,
train_particles.py:529-543): ``{prefix}_generator_epoch{E}.sav`` /
``{prefix}_inference_epoch{E}.sav`` with the epoch zero-padded to
``int(log10(num_epochs)) + 1`` digits.  Both cadences are supported: every
``save_interval`` epochs (particles) and once at end-of-run into
``outputs_*/trained/`` (mnist/galaxy).

Payload: instead of a torch whole-module pickle the checkpoint is a
self-describing pickle of {format, kind, config dict, numpy param arrays}.
``load_checkpoint`` restores (params, config).  A ``--resume``-style loader
is additive — the reference never loads its own checkpoints (SURVEY.md
section 3.5).
"""

from __future__ import annotations

import atexit
import os
import pickle
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Tuple

import jax
import numpy as np

from spatialvae_tpu.core.config import config_from_dict, config_to_dict

FORMAT = "spatialvae_tpu.checkpoint.v1"

# Single background writer: device->host fetch happens on the caller thread
# (cheap, async dispatch), the pickle+fsync happens off-thread so training
# never blocks on disk.  Drained at interpreter exit.
_writer = ThreadPoolExecutor(max_workers=1)
_pending = []


def _drain():
    for f in _pending:
        f.result()
    _pending.clear()


atexit.register(_drain)


def _to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_model(path: str, kind: str, params, cfg,
               async_write: bool = False, *, elbo=None,
               image_shape=None) -> None:
    """elbo/image_shape persist the full model semantics (ELBO/pose config:
    dx_scale, theta_prior, rotate/translate, likelihood, channels, softplus)
    so serving can reconstruct exactly what training trained — the arch
    configs alone do not determine them."""
    payload = {
        "format": FORMAT,
        "kind": kind,                      # 'generator' | 'inference'
        "config": config_to_dict(cfg),
        "params": _to_numpy(params),
    }
    if elbo is not None:
        payload["elbo"] = config_to_dict(elbo)
    if image_shape is not None:
        payload["image_shape"] = tuple(int(v) for v in image_shape)

    def write():
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    if async_write:
        _pending.append(_writer.submit(write))
    else:
        write()


def wait_for_checkpoints() -> None:
    """Block until all async checkpoint writes have finished."""
    _drain()


def load_model(path: str):
    """Returns (params, config, kind)."""
    params, cfg, kind, _ = load_model_meta(path)
    return params, cfg, kind


def _load_reference_sav(path: str):
    """Fallback for checkpoints written by the REFERENCE (torch
    whole-module pickles, misc_tools.py:88-104): convert the module to our
    (params, config, kind) on the fly so the serving API and the trainers'
    --resume-* flags accept a migrating user's .sav files directly.  The
    reference never persisted the ELBO/pose semantics or image shape, so
    meta comes back empty."""
    from spatialvae_tpu.io.torch_import import import_module, \
        load_torch_module

    params, cfg, kind = import_module(load_torch_module(path))
    return params, cfg, kind, {"elbo": None, "image_shape": None}


def load_model_meta(path: str):
    """Returns (params, config, kind, meta).

    meta = {'elbo': ElboConfig | None, 'image_shape': (n, m) | None} —
    the persisted training semantics (absent in pre-r2 checkpoints).

    Also accepts reference-written .sav files (torch module pickles),
    detected by format: torch>=1.6 saves a zip archive, and any payload
    our unpickler cannot read or recognise is retried through torch."""
    with open(path, "rb") as f:
        if f.read(4) == b"PK\x03\x04":           # torch zipfile container
            return _load_reference_sav(path)
        f.seek(0)
        try:
            payload = pickle.load(f)
        except Exception:
            payload = None     # legacy torch needs torch's own unpickler
    if not isinstance(payload, dict) or payload.get("format") != FORMAT:
        # pre-1.6 torch saves plain-unpickle to their magic-number int
        # rather than raising — treat every unrecognised payload as a
        # torch candidate before giving up
        try:
            return _load_reference_sav(path)
        except Exception as e:
            # chain the cause: 'torch is not installed' or a corrupt-pickle
            # message is the actionable part for the user
            raise ValueError(
                f"{path} is neither a {FORMAT} checkpoint nor a loadable "
                f"reference torch .sav ({type(e).__name__}: {e})") from e
    elbo = payload.get("elbo")
    meta = {
        "elbo": None if elbo is None else config_from_dict(elbo),
        "image_shape": payload.get("image_shape"),
    }
    return (payload["params"], config_from_dict(payload["config"]),
            payload["kind"], meta)


def save_optimizer(path: str, opt_state, epoch: int,
                   async_write: bool = False) -> None:
    """Persist Adam state (count/mu/nu) + the epoch index so a resumed run
    continues the exact trajectory (bias correction and moments do NOT
    restart).  Additive: the reference has no resume at all (SURVEY 3.5)."""
    payload = {
        "format": FORMAT,
        "kind": "optimizer",
        "epoch": int(epoch),
        "count": int(np.asarray(opt_state.count)),
        "mu": _to_numpy(opt_state.mu),
        "nu": _to_numpy(opt_state.nu),
    }

    def write():
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    if async_write:
        _pending.append(_writer.submit(write))
    else:
        write()


def load_optimizer(path: str):
    """Returns (FusedAdamState, epoch)."""
    import jax.numpy as jnp

    from spatialvae_tpu.train.optimizer import FusedAdamState

    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("format") != FORMAT or payload.get("kind") != "optimizer":
        raise ValueError(f"{path} is not a {FORMAT} optimizer checkpoint")
    state = FusedAdamState(
        count=jnp.asarray(payload["count"], jnp.int32),
        mu=jax.tree_util.tree_map(jnp.asarray, payload["mu"]),
        nu=jax.tree_util.tree_map(jnp.asarray, payload["nu"]),
    )
    return state, payload["epoch"]


def optimizer_path(prefix: str, epoch: int, digits: int,
                   trained_dir: Optional[str] = None) -> str:
    e = str(epoch + 1).zfill(digits)
    opt = f"{prefix}_optimizer_epoch{e}.sav"
    if trained_dir is not None:
        opt = os.path.join(trained_dir, opt)
    return opt


def checkpoint_paths(prefix: str, epoch: int, digits: int,
                     trained_dir: Optional[str] = None) -> Tuple[str, str]:
    e = str(epoch + 1).zfill(digits)
    gen = f"{prefix}_generator_epoch{e}.sav"
    inf = f"{prefix}_inference_epoch{e}.sav"
    if trained_dir is not None:
        gen = os.path.join(trained_dir, gen)
        inf = os.path.join(trained_dir, inf)
    return gen, inf


def save_trained_models(prefix: Optional[str], epoch: int, digits: int,
                        save_interval: int, trained_dir: Optional[str],
                        p_params, p_cfg, q_params, q_cfg,
                        async_write: bool = True, *, elbo=None,
                        image_shape=None) -> bool:
    """Gate + save both networks (misc_tools.py:88-104 semantics).

    Writes happen on a background thread by default so the epoch loop never
    stalls on disk (the reference blocks on torch.save)."""
    if prefix is None or (epoch + 1) % save_interval != 0:
        return False
    gen, inf = checkpoint_paths(prefix, epoch, digits, trained_dir)
    save_model(gen, "generator", p_params, p_cfg, async_write=async_write,
               elbo=elbo, image_shape=image_shape)
    save_model(inf, "inference", q_params, q_cfg, async_write=async_write,
               elbo=elbo, image_shape=image_shape)
    return True
