"""Pixel-axis (sequence-parallel analogue) sharding for the fused kernel.

SURVEY §5.7's long-context design: for images too large for one chip's HBM
/ VMEM working set, shard the PIXEL axis over the mesh's 'model' axis and
psum the per-shard partials.  This is exact for the fused int8 loss+grad
kernel because every one of its outputs is a SUM over pixel tiles:

    loss  = sum_t loss(tile_t)              (train_galaxy.py:118 BCE sum)
    dfold = sum_t x3_t^T dh0_t              (B, 4, H)
    dW1   = sum_t a0_t^T dh1_t,  db1, dWh, dbh likewise

so running the unchanged kernel on an HW/K coordinate slice per device and
psum-ing is algebraically the single-device computation with a different
tile-accumulation order (float reassociation only).  The quantisation
scales are per-tile / host-analytic (kernels/fused_loss_int8.py), hence
shard-local by construction — no cross-shard scale coupling.

Autodiff: ``fused_decoder_bce_int8`` is a custom-vjp op; under shard_map
the replicated operands (fold, weights) receive psum'd cotangents, which
is exactly the sum of per-shard gradient partials.  The pose fold runs
replicated in XLA outside the shard_map so dtheta/ddx/dz flow through its
autodiff from the psum'd dfold.

Composition: 'data' x 'model' meshes work — batch shards ride the spmd DP
step (parallel/spmd.py) while this op shards pixels inside each data
shard.  Reference scope note: the reference (single-GPU torch) has no
counterpart; this is the TPU-native answer to its whole-image decode
(models.py:90-132) hitting memory walls at megapixel HW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def can_pixel_shard(hw: int, n_shards: int) -> bool:
    """Each shard must still satisfy the kernel's tiling contract
    (hw_tiles_ok — the one shared definition)."""
    from spatialvae_tpu.kernels.fused_loss_int8 import hw_tiles_ok

    return hw % n_shards == 0 and hw_tiles_ok(hw // n_shards)


def make_pixel_sharded_loss(p_cfg, mesh, *, axis: str = "model",
                            family: str = "bernoulli"):
    """Returns loss(p_params, coords, theta, dx, z, y_t, mask=None) — the
    fused int8 kernel's summed reconstruction loss with the pixel axis
    sharded over ``axis``.  Differentiable exactly like the single-device
    op; y_t is (B, C, HW) and is sharded on its pixel axis, coords (HW, 2)
    on its first.
    """
    from spatialvae_tpu.kernels.fused_loss_int8 import (
        fused_decoder_bce_int8,
    )
    from spatialvae_tpu.models.spatial import fold_pose_into_first_layer

    # the colored family cannot pixel-shard: its chunk-permuted coords
    # pair every pixel with rows from the other coordinate half, which a
    # contiguous HW shard does not hold (fused_loss_int8 module docstring)
    assert family in ("bernoulli", "gaussian"), family

    def loss(p_params, coords, theta, dx, z, y_t, mask=None):
        """NOTE: call under jit (shard_map placement of uncommitted
        eager arrays raises a sharding-override error otherwise)."""
        assert can_pixel_shard(coords.shape[0], mesh.shape[axis])
        w0, w1f, c = fold_pose_into_first_layer(p_params, p_cfg, theta,
                                                dx, z)
        fold = jnp.stack([w0, w1f, c, jnp.zeros_like(c)], axis=1)
        hidden = p_params["layers"][0]
        head = p_params["layers"][1]

        def per_device(fold, coords_s, w1, b1, wht, bht, yt_s, mask_s):
            part = fused_decoder_bce_int8(fold, coords_s, w1, b1, wht,
                                          bht, yt_s, mask_s, family)
            return jax.lax.psum(part, axis)

        in_specs = (P(), P(axis), P(), P(), P(), P(),
                    P(None, None, axis),
                    P(axis) if mask is not None else None)
        fn = jax.shard_map(per_device, mesh=mesh, in_specs=in_specs,
                           out_specs=P(), check_vma=False)
        return fn(fold, coords, hidden["w"], hidden["b"], head["w"].T,
                  head["b"], y_t, mask)

    return loss
