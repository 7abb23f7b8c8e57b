"""Codec round-trip + image-op tests (SURVEY.md section 4.3)."""

import io

import numpy as np
import pytest

from spatialvae_tpu.io.image import crop, downsample, normalize, normalize_whole
from spatialvae_tpu.io.mrc import (
    MrcHeader,
    make_header,
    mode_for_dtype,
    parse_mrc,
    write_mrc,
)
from spatialvae_tpu.io.png import save_image_grid


@pytest.mark.parametrize("dtype,mode", [
    (np.int8, 0), (np.int16, 1), (np.float32, 2), (np.complex64, 4),
    (np.uint16, 6),
])
def test_mrc_roundtrip(dtype, mode):
    rng = np.random.RandomState(0)
    if np.issubdtype(dtype, np.complexfloating):
        arr = (rng.randn(3, 5, 7) + 1j * rng.randn(3, 5, 7)).astype(dtype)
    elif np.issubdtype(dtype, np.floating):
        arr = rng.randn(3, 5, 7).astype(dtype)
    else:
        arr = rng.randint(0, 100, size=(3, 5, 7)).astype(dtype)

    buf = io.BytesIO()
    header = make_header(arr.shape, dtype=dtype)
    write_mrc(buf, arr, header=header)
    out, hdr, ext = parse_mrc(buf.getvalue())
    assert hdr.mode == mode
    assert hdr.nx == 7 and hdr.ny == 5 and hdr.nz == 3
    np.testing.assert_array_equal(out, arr)


def test_truncated_mrc_never_reaches_native_decoder(tmp_path):
    """A stack whose data section is shorter than the header promises must
    take the pure-Python error path: the ctypes binding returns None for
    short buffers (the C decoder would read out of bounds) and parse_mrc
    raises a proper error."""
    arr = np.arange(3 * 5 * 7, dtype=np.float32).reshape(3, 5, 7)
    buf = io.BytesIO()
    write_mrc(buf, arr, header=make_header(arr.shape, dtype=np.float32))
    payload = buf.getvalue()[:-40]                  # chop the last rows
    path = tmp_path / "trunc.mrc"
    path.write_bytes(payload)

    from spatialvae_tpu import native
    from spatialvae_tpu.io.loaders import load_images

    if native.available():
        hdr = MrcHeader.unpack(payload)
        count = hdr.nz * hdr.ny * hdr.nx
        assert native.mrc_decode_f32(payload[1024:], count, hdr.mode) is None
    with pytest.raises(Exception):
        load_images(str(path))


def test_mrc_default_header_and_squeeze():
    arr = np.random.RandomState(1).randn(1, 6, 6).astype(np.float32)
    buf = io.BytesIO()
    write_mrc(buf, arr)
    out, hdr, _ = parse_mrc(buf.getvalue())
    assert out.shape == (6, 6)            # nz==1 squeezed
    np.testing.assert_allclose(hdr.amean, arr.mean(), rtol=1e-5)


def test_mrc_extended_header_roundtrip():
    arr = np.zeros((2, 4, 4), dtype=np.float32)
    ext = b"EXTENDED" * 4
    buf = io.BytesIO()
    hdr = make_header(arr.shape, exthd_size=len(ext))
    write_mrc(buf, arr, header=hdr, extended_header=ext)
    out, hdr2, ext2 = parse_mrc(buf.getvalue())
    assert ext2 == ext
    assert out.shape == (2, 4, 4)


def test_mrc_bad_dtype_raises_valueerror():
    """The reference raises a bare string (a TypeError, mrc.py:159); we
    raise a proper ValueError."""
    with pytest.raises(ValueError):
        mode_for_dtype(np.float64)


def test_header_size_is_1024():
    assert len(MrcHeader().pack()) == 1024


def test_downsample_preserves_constant_and_shape():
    x = np.full((2, 16, 16), 3.0, dtype=np.float32)
    y = downsample(x, factor=2)
    assert y.shape == (2, 8, 8)
    np.testing.assert_allclose(y, 3.0, atol=1e-5)


def test_downsample_energy_scaling_on_cosine():
    """A low-frequency mode must survive fourier-cropping with unit gain."""
    n = 32
    t = np.arange(n)
    x = (np.cos(2 * np.pi * 2 * t / n)[None, :]
         * np.ones((n, 1)))[None].astype(np.float32)
    y = downsample(x, shape=(16, 16))
    t2 = np.arange(16)
    expected = (np.cos(2 * np.pi * 2 * t2 / 16)[None, :]
                * np.ones((16, 1)))[None]
    np.testing.assert_allclose(y, expected, atol=1e-4)


def test_crop_center():
    x = np.arange(36).reshape(1, 6, 6)
    y = crop(x, 2)
    np.testing.assert_array_equal(y[0], [[14, 15], [20, 21]])


def test_normalize_annulus():
    rng = np.random.RandomState(2)
    x = rng.randn(3, 10, 10).astype(np.float32)
    y = normalize(x, radius=3)
    yy, xx = np.ogrid[:10, :10]
    ann = np.sqrt((5 - yy) ** 2 + (5 - xx) ** 2) >= 3
    for i in range(3):
        np.testing.assert_allclose(y[i][ann].mean(), 0.0, atol=1e-5)
        np.testing.assert_allclose(y[i][ann].std(), 1.0, atol=1e-4)


def test_normalize_whole():
    rng = np.random.RandomState(3)
    x = rng.randn(4, 6, 6).astype(np.float32) * 5 + 2
    y = normalize_whole(x)
    flat = y.reshape(4, -1)
    np.testing.assert_allclose(flat.mean(1), 0.0, atol=1e-5)
    np.testing.assert_allclose(flat.std(1), 1.0, atol=1e-4)


def test_png_grid_geometry(tmp_path):
    """Grid layout must match torchvision save_image's: padding borders,
    pad_value 0.5, nrow=floor(sqrt(B)) (misc_tools.py:31-39)."""
    from PIL import Image

    b, n, m = 5, 4, 4
    data = np.zeros((b, n * m), dtype=np.float32)
    data[0] = 1.0                          # first image all-white
    out = tmp_path / "grid.png"
    save_image_grid(data, str(out), (n, m))
    img = np.asarray(Image.open(out))
    # nrow = floor(sqrt(5)) = 2 cols, ceil(5/2) = 3 rows
    assert img.shape == (3 * (4 + 3) + 3, 2 * (4 + 3) + 3)
    # padding pixels quantise to 0.5*255+0.5 = 128
    assert img[0, 0] == 128
    # first cell content is white, second cell black
    assert img[3, 3] == 255
    assert img[3, 3 + 4 + 3] == 0
