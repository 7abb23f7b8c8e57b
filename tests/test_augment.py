"""Device-side rotation augmentation vs PIL BICUBIC parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from spatialvae_tpu.transforms.augment import rotate_images_bicubic


def _pil_rotate(img: np.ndarray, theta: float) -> np.ndarray:
    from PIL import Image

    im = Image.fromarray(img)
    return np.array(im.rotate(360 * theta / (2 * np.pi),
                              resample=Image.BICUBIC), copy=False)


def test_zero_rotation_is_identity():
    rng = np.random.RandomState(0)
    imgs = rng.rand(2, 12, 12).astype(np.float32)
    out = np.asarray(rotate_images_bicubic(jnp.asarray(imgs),
                                           jnp.zeros(2)))
    np.testing.assert_allclose(out, imgs, atol=1e-5)


@pytest.mark.parametrize("theta", [0.3, 1.2, np.pi / 2, 4.0])
def test_matches_pil_bicubic_float(theta):
    """Interior pixels must match PIL's float-mode BICUBIC rotate closely
    (train_particles.py:40-42 rotates float32 images through PIL)."""
    rng = np.random.RandomState(1)
    img = rng.rand(17, 17).astype(np.float32)
    ref = _pil_rotate(img, theta)
    out = np.asarray(rotate_images_bicubic(jnp.asarray(img[None]),
                                           jnp.asarray([theta])))[0]
    # compare away from the boundary (PIL's edge handling differs slightly)
    inner = (slice(3, -3), slice(3, -3))
    np.testing.assert_allclose(out[inner], ref[inner], atol=2e-2)


def test_quarter_turn_moves_known_pixel():
    """CCW quarter turn: a bright spot right of center moves above center."""
    img = np.zeros((15, 15), dtype=np.float32)
    img[7, 11] = 1.0                       # right of center
    out = np.asarray(rotate_images_bicubic(jnp.asarray(img[None]),
                                           jnp.asarray([np.pi / 2])))[0]
    assert out[3, 7] > 0.5                 # now above center
    assert out[7, 11] < 0.1


def test_multichannel_rotation():
    rng = np.random.RandomState(2)
    imgs = rng.rand(2, 10, 10, 3).astype(np.float32)
    out = np.asarray(rotate_images_bicubic(jnp.asarray(imgs),
                                           jnp.asarray([0.0, 1.0])))
    assert out.shape == imgs.shape
    np.testing.assert_allclose(out[0], imgs[0], atol=1e-5)
