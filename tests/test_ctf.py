"""CTF physics + application tests."""

import numpy as np
import jax.numpy as jnp

from spatialvae_tpu.ctf import apply_ctf, apply_ctf_spatial, ctf_filter
from spatialvae_tpu.ctf.physics import compute_2d_ctf, parse_ctf


def _params_table(tmp_path, rows):
    path = tmp_path / "ctf.txt"
    path.write_text("\n".join(" ".join(str(v) for v in r) for r in rows))
    return str(path)


def test_parse_ctf_columns(tmp_path):
    path = _params_table(tmp_path, [
        [1.5, 2.0, 300.0, 1.2, 50.0, 10.0, 0.1, 45.0],
        [2.5, 2.0, 300.0, 1.2, 50.0, 10.0, 0.2, 90.0],
    ])
    df = parse_ctf(path)
    assert list(df.columns) == ["defocus", "cs", "voltage", "apix", "bfactor",
                                "ampcont", "dfdiff", "dfang"]
    assert len(df) == 2
    np.testing.assert_allclose(df.defocus[1], 2.5)


def test_ctf_filter_shape_and_dtype(tmp_path):
    path = _params_table(tmp_path, [
        [1.5, 2.0, 300.0, 1.2, 50.0, 10.0, 0.0, 0.0],
        [2.0, 2.0, 300.0, 1.2, 50.0, 10.0, 0.0, 30.0],
    ])
    filt = ctf_filter(parse_ctf(path), 15, 15, scale=1.0)
    assert filt.shape == (2, 15, 15)
    assert filt.dtype == np.float32
    # different defocus -> different kernels
    assert not np.allclose(filt[0], filt[1])


def test_ctf_zero_frequency_value():
    """At s=0: gamma=0, so ctf = -w (pure amplitude contrast)."""
    freqs = np.zeros((1, 2), dtype=np.float32)
    c = compute_2d_ctf(freqs, 15000.0, 15000.0, 0.0, 300.0, 2.0, 0.1)
    np.testing.assert_allclose(c[0], -0.1, atol=1e-6)


def test_ctf_bfactor_damps_high_frequencies():
    freqs = np.array([[0.25, 0.25]], dtype=np.float32)
    c0 = compute_2d_ctf(freqs, 15000.0, 15000.0, 0.0, 300.0, 2.0, 0.1)
    cb = compute_2d_ctf(freqs, 15000.0, 15000.0, 0.0, 300.0, 2.0, 0.1,
                        bfactor=100.0)
    assert abs(cb[0]) < abs(c0[0])


def test_fft_apply_matches_spatial_conv():
    """The FFT linear-correlation path must equal the grouped spatial conv
    (the reference's semantics, train_particles.py:112-124)."""
    rng = np.random.RandomState(0)
    y = rng.randn(3, 11, 11).astype(np.float32)
    k = rng.randn(3, 9, 9).astype(np.float32)
    out_fft = np.asarray(apply_ctf(jnp.asarray(y), jnp.asarray(k)))
    out_conv = np.asarray(apply_ctf_spatial(jnp.asarray(y), jnp.asarray(k)))
    np.testing.assert_allclose(out_fft, out_conv, rtol=1e-4, atol=1e-4)


def test_fft_apply_matches_numpy_oracle():
    from .oracles import _conv_same_corr

    rng = np.random.RandomState(1)
    y = rng.randn(2, 7, 7).astype(np.float32)
    k = rng.randn(2, 7, 7).astype(np.float32)
    out = np.asarray(apply_ctf(jnp.asarray(y), jnp.asarray(k)))
    ref = _conv_same_corr(y.astype(np.float64), k.astype(np.float64))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
