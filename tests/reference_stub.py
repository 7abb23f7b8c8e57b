"""Shared helper for importing /root/reference with stubbed heavyweight
deps (torchvision, skimage) — used by tests/test_reference_parity.py and
tools/reference_throughput.py so the stub cannot drift between them.

The stubs cover module-scope imports the driven code paths never call.
"""

from __future__ import annotations

import sys
import types

REF = "/root/reference"


def stub_reference_imports() -> None:
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.utils = types.ModuleType("torchvision.utils")
        tv.utils.save_image = lambda *a, **k: None
        tv.datasets = types.ModuleType("torchvision.datasets")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv.utils
        sys.modules["torchvision.datasets"] = tv.datasets
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.transform = types.ModuleType("skimage.transform")
        sk.transform.resize = lambda *a, **k: None
        sys.modules["skimage"] = sk
        sys.modules["skimage.transform"] = sk.transform


def import_reference_modules():
    """Returns (spatial_vae.models, train_mnist, train_particles,
    train_galaxy) from /root/reference with deps stubbed."""
    stub_reference_imports()
    sys.path.insert(0, REF)
    try:
        import spatial_vae.models as ref_models
        import train_galaxy as ref_galaxy
        import train_mnist as ref_mnist
        import train_particles as ref_particles

        return ref_models, ref_mnist, ref_particles, ref_galaxy
    finally:
        sys.path.remove(REF)
