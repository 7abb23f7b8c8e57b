"""Import trained reference checkpoints (torch whole-module pickles).

The reference persists its networks with ``torch.save(module, path)``
(reference ``src/misc_tools.py:88-104``: ``{prefix}_generator_epoch{E}.sav``
and ``{prefix}_inference_epoch{E}.sav``) and never loads them back.  A user
migrating from the reference brings those files; this module converts them
into this framework's (param tree, config) pairs so the serving API and the
trainers' ``--resume-*`` flags accept them directly (format auto-detected in
``train/checkpoint.py::load_model_meta``):

    p_params, p_cfg = import_generator("run_generator_epoch100.sav")
    q_params, q_cfg = import_inference("run_inference_epoch100.sav")

Conversion rules (reference ``spatial_vae/models.py``):

- torch ``nn.Linear`` stores (fan_out, fan_in); our trees store the
  transpose (fan_in, fan_out) — see ``nn/layers.py``.
- torch ``nn.Bilinear`` stores (out, in1, in2); ours (in1, in2, out).
- architecture hyperparameters (hidden_dim, num_layers, resid,
  expand_coords, softplus, activation, ...) are *recovered from the module
  structure*, so the returned config reproduces the forward exactly.

Unpickling a whole torch module requires the classes it was built from to
be importable.  If ``spatial_vae`` (the reference package) is on sys.path
it is used; otherwise minimal stand-in classes with the same qualified
names are registered — ``nn.Module`` restores its state through plain
``__dict__`` assignment, so parameter extraction needs no reference code.
"""

from __future__ import annotations

import sys
import types

import numpy as np

from spatialvae_tpu.core.config import (
    InferenceConfig,
    SpatialGeneratorConfig,
    VanillaGeneratorConfig,
)

_REF_CLASSES = ("InferenceNetwork", "SpatialGenerator", "VanillaGenerator",
                "ResidLinear")


def _torch():
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is in the image
        raise ImportError(
            "importing reference .sav checkpoints requires torch "
            "(CPU build is enough)") from e
    return torch


def _ensure_reference_classes(torch) -> None:
    """Make ``spatial_vae.models.*`` resolvable for the unpickler.

    Prefers the user's real reference package; falls back to bare
    ``nn.Module`` subclasses with the right qualified names (unpickling
    bypasses ``__init__`` — only attribute restoration runs)."""
    try:
        import spatial_vae.models  # noqa: F401
        return
    except ImportError:
        pass
    if "spatial_vae.models" in sys.modules:
        return
    pkg = types.ModuleType("spatial_vae")
    mod = types.ModuleType("spatial_vae.models")
    for name in _REF_CLASSES:
        cls = type(name, (torch.nn.Module,),
                   {"__module__": "spatial_vae.models"})
        setattr(mod, name, cls)
    pkg.models = mod
    sys.modules["spatial_vae"] = pkg
    sys.modules["spatial_vae.models"] = mod


def load_torch_module(path: str):
    """torch.load a reference .sav (whole-module pickle) on CPU."""
    torch = _torch()
    _ensure_reference_classes(torch)
    try:
        return torch.load(path, map_location="cpu", weights_only=False)
    except TypeError:  # torch builds predating the weights_only kwarg
        return torch.load(path, map_location="cpu")


# ---------------------------------------------------------------------------
# module-structure walkers
# ---------------------------------------------------------------------------


def _w(linear) -> np.ndarray:
    return np.asarray(linear.weight.detach(), dtype=np.float32).T


def _linear_params(linear) -> dict:
    p = {"w": _w(linear)}
    if getattr(linear, "bias", None) is not None:
        p["b"] = np.asarray(linear.bias.detach(), dtype=np.float32)
    return p


def _act_names(torch):
    nn = torch.nn
    return {nn.Tanh: "tanh", nn.LeakyReLU: "leakyrelu",
            nn.ReLU: "relu", nn.Sigmoid: "sigmoid"}


def _walk_stack(seq, torch):
    """(linears, resid, activation_name) from a reference layer
    ``nn.Sequential``.  ResidLinear contributes its inner ``.linear``
    (identical parameter shape; only the apply differs — models.py:13-21).
    The hidden activation is the first activation instance that appears
    BEFORE the last Linear — the trailing Sigmoid/Softplus output heads
    never name it."""
    names = _act_names(torch)
    children = list(seq.children())
    linears, resid, acts = [], False, []
    for i, m in enumerate(children):
        if isinstance(m, torch.nn.Linear):
            linears.append((i, m))
        elif type(m).__name__ == "ResidLinear":
            linears.append((i, m.linear))
            resid = True
            inner = getattr(m, "act", None)
            if inner is not None and type(inner) in names:
                acts.append((i, names[type(inner)]))
        elif type(m) in names:
            acts.append((i, names[type(m)]))
    last_linear = linears[-1][0]
    act = next((name for i, name in acts if i < last_linear), None)
    return [m for _, m in linears], resid, (act or "tanh")


def _hidden_act(seq, torch):
    """Hidden activation of a SpatialGenerator stack: its FIRST module is
    the activation applied to the summed first-layer terms (models.py:77),
    before any Linear — never the trailing output Sigmoid."""
    first = next(iter(seq.children()))
    return _act_names(torch).get(type(first), "tanh")


# ---------------------------------------------------------------------------
# converters
# ---------------------------------------------------------------------------


def import_inference_module(q_net):
    """reference InferenceNetwork (models.py:24-54) -> (params, cfg)."""
    torch = _torch()
    linears, resid, act = _walk_stack(q_net.layers, torch)
    n = linears[0].in_features
    hidden = linears[0].out_features
    out = linears[-1].out_features
    latent = int(getattr(q_net, "latent_dim", out // 2))
    if out != 2 * latent:
        raise ValueError(
            f"inference head emits {out} features, expected 2*latent_dim="
            f"{2 * latent}")
    cfg = InferenceConfig(n=int(n), latent_dim=latent,
                          hidden_dim=int(hidden),
                          num_layers=len(linears) - 1,
                          activation=act, resid=resid)
    params = {"layers": [_linear_params(m) for m in linears]}
    return params, cfg


def import_spatial_generator_module(p_net):
    """reference SpatialGenerator (models.py:57-132) -> (params, cfg)."""
    torch = _torch()
    coord = p_net.coord_linear
    in_dim = coord.in_features
    hidden = coord.out_features
    latent_lin = getattr(p_net, "latent_linear", None)
    bilinear = getattr(p_net, "bilinear", None)
    linears, resid, _ = _walk_stack(p_net.layers, torch)
    head = linears[-1]
    cfg = SpatialGeneratorConfig(
        latent_dim=int(latent_lin.in_features) if latent_lin is not None
        else 0,
        hidden_dim=int(hidden),
        n_out=int(head.out_features),
        num_layers=len(linears),
        activation=_hidden_act(p_net.layers, torch),
        softplus=bool(getattr(p_net, "softplus", False)),
        resid=resid,
        expand_coords=bool(getattr(p_net, "expand_coords", in_dim == 5)),
        bilinear=bilinear is not None,
    )
    params = {"coord": _linear_params(coord),
              "layers": [_linear_params(m) for m in linears]}
    if latent_lin is not None:
        params["latent"] = {"w": _w(latent_lin)}
        if bilinear is not None:
            # torch nn.Bilinear: (out, in1, in2); ours: (in1, in2, out)
            params["bilinear"] = {"w": np.asarray(
                bilinear.weight.detach(), dtype=np.float32
            ).transpose(1, 2, 0)}
    return params, cfg


def import_vanilla_generator_module(p_net):
    """reference VanillaGenerator (models.py:135-172) -> (params, cfg)."""
    torch = _torch()
    linears, resid, act = _walk_stack(p_net.layers, torch)
    n_out = int(getattr(p_net, "n_out", 1))
    cfg = VanillaGeneratorConfig(
        n=int(linears[-1].out_features) // n_out,
        latent_dim=int(linears[0].in_features),
        hidden_dim=int(linears[0].out_features),
        n_out=n_out,
        num_layers=len(linears) - 1,
        activation=act,
        softplus=bool(getattr(p_net, "softplus", False)),
        resid=resid,
    )
    return {"layers": [_linear_params(m) for m in linears]}, cfg


def import_module(module):
    """(params, cfg, kind) for any of the three reference networks,
    dispatched on module structure (works with stand-in classes)."""
    if "coord_linear" in getattr(module, "_modules", {}):
        params, cfg = import_spatial_generator_module(module)
        return params, cfg, "generator"
    if hasattr(module, "n_out"):                     # VanillaGenerator
        params, cfg = import_vanilla_generator_module(module)
        return params, cfg, "generator"
    params, cfg = import_inference_module(module)
    return params, cfg, "inference"


def import_generator(path: str):
    """.sav generator checkpoint -> (params, cfg)."""
    params, cfg, kind = import_module(load_torch_module(path))
    if kind != "generator":
        raise ValueError(f"{path} holds an inference network, "
                         "not a generator")
    return params, cfg


def import_inference(path: str):
    """.sav inference checkpoint -> (params, cfg)."""
    params, cfg, kind = import_module(load_torch_module(path))
    if kind != "inference":
        raise ValueError(f"{path} holds a generator, "
                         "not an inference network")
    return params, cfg


def load_reference_checkpoint(generator_path: str, inference_path: str):
    """Both halves of a reference save -> trainer-shaped params + configs.

    Returns ({"q": ..., "p": ...}, q_cfg, p_cfg) ready for
    ``TrainState``/``Trainer`` or the serving API."""
    p_params, p_cfg = import_generator(generator_path)
    q_params, q_cfg = import_inference(inference_path)
    return {"q": q_params, "p": p_params}, q_cfg, p_cfg
