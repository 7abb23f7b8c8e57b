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

The reverse direction is also covered for users with torch-based
downstream analysis: ``export_generator`` / ``export_inference`` write
our params back as reference-layout torch module pickles that
``torch.load`` + forward anywhere the reference package is installed
(``tools/export_torch_checkpoint.py`` converts saved checkpoints).

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

import contextlib
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


@contextlib.contextmanager
def _reference_classes(torch):
    """Make ``spatial_vae.models.*`` resolvable for the (un)pickler WHILE
    the context is active, without leaving anything behind.

    Prefers the user's real reference package; falls back to bare
    ``nn.Module`` subclasses with the right qualified names (unpickling
    bypasses ``__init__`` — only attribute restoration runs).  The
    stand-in modules are REMOVED from sys.modules on exit: leaving them
    cached would shadow a real ``spatial_vae`` package put on sys.path
    later in the same process.  Reentrant: a nested context sees the
    entries present and leaves cleanup to the outermost one."""
    try:
        import spatial_vae.models  # noqa: F401
        yield
        return
    except ImportError:
        pass
    if "spatial_vae.models" in sys.modules:
        yield
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
    try:
        yield
    finally:
        if sys.modules.get("spatial_vae.models") is mod:
            del sys.modules["spatial_vae.models"]
        if sys.modules.get("spatial_vae") is pkg:
            del sys.modules["spatial_vae"]


def load_torch_module(path: str):
    """torch.load a reference .sav (whole-module pickle) on CPU."""
    torch = _torch()
    with _reference_classes(torch):
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


# ---------------------------------------------------------------------------
# export: our (params, cfg) -> reference-compatible torch module pickles
# ---------------------------------------------------------------------------
#
# The reverse migration: users keep torch-based downstream analysis that
# ``torch.load``s the reference's .sav modules.  The exported pickle
# references the ``spatial_vae.models`` class names, so it loads (and runs
# forward) wherever the real reference package is installed; loading it
# back HERE round-trips bit-exactly through the importer above.


def _resolve_classes(torch) -> dict:
    """The class objects to pickle against: the user's real reference
    package when importable, our registered stand-ins otherwise (pickle
    saves classes by reference and verifies identity with the module
    attribute, so the two sources must never mix).  Callers must hold an
    active ``_reference_classes`` context that spans the torch.save —
    pickling resolves the classes through sys.modules at save time."""
    import spatial_vae.models as m

    return {name: getattr(m, name) for name in _REF_CLASSES}


def _blank_module(cls, torch):
    """Instance of ``cls`` with nn.Module plumbing but WITHOUT running the
    reference ``__init__`` (it demands constructor args and prints)."""
    obj = cls.__new__(cls)
    torch.nn.Module.__init__(obj)
    return obj


def _torch_linear(p: dict, torch):
    w = np.asarray(p["w"], dtype=np.float32)
    lin = torch.nn.Linear(w.shape[0], w.shape[1], bias="b" in p)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.ascontiguousarray(w.T)))
        if "b" in p:
            lin.bias.copy_(torch.from_numpy(
                np.asarray(p["b"], dtype=np.float32)))
    return lin


def _torch_act(name: str, torch):
    nn = torch.nn
    return {"tanh": nn.Tanh, "leakyrelu": nn.LeakyReLU, "relu": nn.ReLU,
            "sigmoid": nn.Sigmoid}[name]()


def _torch_stack(layers, cfg, classes, torch, head_modules):
    """Hidden [Linear/ResidLinear + act] stack + head Linear + trailing
    modules, mirroring the reference Sequential layout exactly."""
    mods = []
    for p in layers[:-1]:
        if cfg.resid:
            r = _blank_module(classes["ResidLinear"], torch)
            r.linear = _torch_linear(p, torch)
            r.act = _torch_act(cfg.activation, torch)
            mods.append(r)
        else:
            mods.extend([_torch_linear(p, torch),
                         _torch_act(cfg.activation, torch)])
    mods.append(_torch_linear(layers[-1], torch))
    mods.extend(head_modules)
    return torch.nn.Sequential(*mods)


def build_generator_module(params, cfg):
    """Our (params, SpatialGeneratorConfig | VanillaGeneratorConfig) ->
    a torch module with the reference's exact attribute/layer layout.

    NOTE: when the reference package is not importable the classes are
    transient stand-ins — pickling such a module must happen inside the
    same ``_reference_classes`` context (use ``export_generator``)."""
    torch = _torch()
    with _reference_classes(torch):
        classes = _resolve_classes(torch)
        return _build_generator_module(params, cfg, classes, torch)


def _build_generator_module(params, cfg, classes, torch):
    if isinstance(cfg, VanillaGeneratorConfig):
        net = _blank_module(classes["VanillaGenerator"], torch)
        net.n_out = cfg.n_out
        net.softplus = cfg.softplus
        head = [torch.nn.Sigmoid()]
        if cfg.softplus:
            head.append(torch.nn.Softplus())      # models.py:156-157
        # the first layer is always a plain Linear + act (models.py:146);
        # only the later hidden layers take the resid form
        layers = params["layers"]
        stack = _torch_stack(layers[1:], cfg, classes, torch, head)
        net.layers = torch.nn.Sequential(
            _torch_linear(layers[0], torch),
            _torch_act(cfg.activation, torch), *stack.children())
        return net.eval()
    net = _blank_module(classes["SpatialGenerator"], torch)
    net.softplus = cfg.softplus
    net.expand_coords = cfg.expand_coords
    net.latent_dim = cfg.latent_dim
    net.coord_linear = _torch_linear(params["coord"], torch)
    if cfg.latent_dim > 0:
        net.latent_linear = _torch_linear(params["latent"], torch)
        if cfg.bilinear:
            w = np.asarray(params["bilinear"]["w"], dtype=np.float32)
            bl = torch.nn.Bilinear(w.shape[0], w.shape[1], w.shape[2],
                                   bias=False)
            with torch.no_grad():
                bl.weight.copy_(torch.from_numpy(
                    np.ascontiguousarray(w.transpose(2, 0, 1))))
            net.bilinear = bl
    # layers = [activation()] + hidden stack + head + Sigmoid
    # (models.py:77-86) — handled as a 0-hidden _torch_stack plus the
    # leading activation
    stack = _torch_stack(params["layers"], cfg, classes, torch,
                         [torch.nn.Sigmoid()])
    net.layers = torch.nn.Sequential(_torch_act(cfg.activation, torch),
                                     *stack.children())
    return net.eval()


def build_inference_module(params, cfg: InferenceConfig):
    torch = _torch()
    with _reference_classes(torch):
        classes = _resolve_classes(torch)
        return _build_inference_module(params, cfg, classes, torch)


def _build_inference_module(params, cfg, classes, torch):
    net = _blank_module(classes["InferenceNetwork"], torch)
    net.latent_dim = cfg.latent_dim
    net.n = cfg.n
    layers = params["layers"]
    stack = _torch_stack(layers[1:], cfg, classes, torch, [])
    net.layers = torch.nn.Sequential(
        _torch_linear(layers[0], torch),
        _torch_act(cfg.activation, torch), *stack.children())
    return net.eval()


def export_generator(params, cfg, path: str) -> None:
    """Write a reference-format generator .sav (torch module pickle).

    One ``_reference_classes`` context spans build AND save: pickle
    verifies class identity through sys.modules at save time, so the
    stand-ins must still be registered when torch.save runs."""
    torch = _torch()
    with _reference_classes(torch):
        torch.save(_build_generator_module(
            params, cfg, _resolve_classes(torch), torch), path)


def export_inference(params, cfg: InferenceConfig, path: str) -> None:
    """Write a reference-format inference .sav (torch module pickle)."""
    torch = _torch()
    with _reference_classes(torch):
        torch.save(_build_inference_module(
            params, cfg, _resolve_classes(torch), torch), path)
