"""Native host-runtime library vs pure-Python/numpy consistency."""

import io

import numpy as np
import pytest

from spatialvae_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_u8_to_f32_scale():
    rng = np.random.RandomState(0)
    a = (rng.rand(333, 77) * 255).astype(np.uint8)
    out = native.u8_to_f32_scale(a)
    np.testing.assert_allclose(out, a.astype(np.float32) / 255.0, rtol=1e-6)


def test_normalize_whole_matches_numpy():
    rng = np.random.RandomState(1)
    a = (rng.randn(16, 40, 40) * 3 + 1).astype(np.float32)
    fast = np.ascontiguousarray(a).copy()
    assert native.normalize_whole_inplace(fast)
    flat = a.reshape(16, -1)
    ref = ((a - flat.mean(1)[:, None, None])
           / flat.std(1)[:, None, None])
    np.testing.assert_allclose(fast, ref, rtol=2e-4, atol=2e-5)


def test_mrc_decode_matches_python_codec():
    from spatialvae_tpu.io.mrc import make_header, write_mrc

    rng = np.random.RandomState(2)
    for dtype in (np.int8, np.int16, np.float32, np.uint16):
        if np.issubdtype(dtype, np.floating):
            arr = rng.randn(4, 9, 9).astype(dtype)
        else:
            arr = rng.randint(0, 90, size=(4, 9, 9)).astype(dtype)
        buf = io.BytesIO()
        write_mrc(buf, arr, header=make_header(arr.shape, dtype=dtype))
        content = buf.getvalue()
        out = native.mrc_decode_f32(content[1024:], arr.size,
                                    {np.int8: 0, np.int16: 1,
                                     np.float32: 2, np.uint16: 6}[dtype])
        np.testing.assert_allclose(out.reshape(arr.shape),
                                   arr.astype(np.float32))


def test_grid_tile_matches_python_path():
    rng = np.random.RandomState(3)
    imgs = rng.rand(5, 6, 7, 3).astype(np.float32)
    xmaps, ymaps, pad, pv = 2, 3, 3, 0.5
    fast = native.grid_tile(imgs, xmaps, ymaps, pad, pv)

    grid = np.full(((6 + pad) * ymaps + pad, (7 + pad) * xmaps + pad, 3), pv,
                   dtype=np.float32)
    k = 0
    for gy in range(ymaps):
        for gx in range(xmaps):
            if k >= 5:
                break
            grid[gy * (6 + pad) + pad:gy * (6 + pad) + pad + 6,
                 gx * (7 + pad) + pad:gx * (7 + pad) + pad + 7] = imgs[k]
            k += 1
    ref = np.clip(grid * 255.0 + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(fast, ref)


def test_mrc_loader_fast_path(tmp_path):
    from spatialvae_tpu.io.loaders import load_images
    from spatialvae_tpu.io.mrc import make_header, write_mrc

    arr = np.random.RandomState(4).randn(3, 8, 8).astype(np.float32)
    path = tmp_path / "stack.mrcs"
    with open(path, "wb") as f:
        write_mrc(f, arr, header=make_header(arr.shape, dtype=np.float32))
    out = load_images(str(path))
    np.testing.assert_allclose(out, arr)
