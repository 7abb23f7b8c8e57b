#!/usr/bin/env python
"""Convert a spatialvae-tpu checkpoint to a reference-format torch .sav.

Usage: python tools/export_torch_checkpoint.py IN.sav OUT.sav

IN.sav is a checkpoint written by the trainers (generator or inference —
the kind is stored in the payload); OUT.sav is a torch whole-module
pickle with the reference's exact module layout (spatial_vae/models.py),
loadable by any torch-based downstream analysis the user kept from the
reference.  The reference package does not need to be installed to
convert; it IS needed wherever OUT.sav is later torch.load'ed, since the
pickle references its class names (exactly like the reference's own
saves).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__.strip(), file=sys.stderr)
        return 2
    src, dst = sys.argv[1], sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")   # host-only conversion

    from spatialvae_tpu.core.config import InferenceConfig
    from spatialvae_tpu.io.torch_import import (
        export_generator,
        export_inference,
    )
    from spatialvae_tpu.train.checkpoint import load_model

    params, cfg, kind = load_model(src)
    if kind == "inference":
        assert isinstance(cfg, InferenceConfig)
        export_inference(params, cfg, dst)
    else:
        export_generator(params, cfg, dst)
    print(f"# wrote {kind} torch module to {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
