"""Contrast transfer function physics for cryo-EM particles.

Behavioural parity with /root/reference/spatial_vae/ctf.py:7-56: the standard
weak-phase CTF model — electron wavelength from accelerating voltage
(relativistically corrected), astigmatic defocus, spherical aberration and
amplitude contrast, with an optional B-factor envelope.  Filters are built
once on the host (numpy) and shipped to HBM; the device applies them in the
Fourier domain (see spatialvae_tpu.ctf.apply).

Reference quirks replicated (they affect ELBO parity):
- the table's ``dfdiff`` column is parsed but ignored — defocus*10000 is used
  for both defocus axes (ctf.py:45-46)
- the caller forces image dims odd before building filters
  (train_particles.py:355-358); `ctf_filter` itself takes n, m as given
"""

from __future__ import annotations

import numpy as np


def compute_2d_ctf(freqs: np.ndarray, dfu: float, dfv: float, dfang: float,
                   volt: float, cs: float, w: float,
                   bfactor: float | None = None) -> np.ndarray:
    """CTF value at each spatial frequency.

    freqs: (K, 2) cycles/Angstrom; dfu/dfv: defocus (Angstrom) along the
    major/minor axes; dfang: astigmatism angle (radians); volt: kV; cs:
    spherical aberration (mm); w: amplitude contrast fraction.
    """
    volt = volt * 1000.0                       # kV -> V
    cs = cs * 1e7                              # mm -> Angstrom
    # relativistic electron wavelength (Angstrom)
    lam = 12.2639 / np.sqrt(volt + 0.97845e-6 * volt ** 2)

    fx, fy = freqs[:, 0], freqs[:, 1]
    ang = np.arctan2(fy, fx)
    s2 = fx ** 2 + fy ** 2
    df = 0.5 * (dfu + dfv + (dfu - dfv) * np.cos(2.0 * (ang - dfang)))
    gamma = 2.0 * np.pi * (-0.5 * df * lam * s2
                           + 0.25 * cs * lam ** 3 * s2 ** 2)
    ctf = np.sqrt(1.0 - w ** 2) * np.sin(gamma) - w * np.cos(gamma)
    if bfactor is not None:
        ctf = ctf * np.exp(-bfactor / 4.0 * s2)
    return ctf.astype(freqs.dtype)


def parse_ctf(path):
    """Parse a whitespace CTF parameter table.

    Columns (ctf.py:27-30): defocus cs voltage apix bfactor ampcont dfdiff
    dfang.  Returns a pandas DataFrame with those column names.
    """
    import pandas as pd

    params = pd.read_csv(path, sep=r"\s+", header=None)
    params.columns = ["defocus", "cs", "voltage", "apix", "bfactor",
                      "ampcont", "dfdiff", "dfang"]
    return params


def ctf_filter(ctf_params, n: int, m: int, scale: float = 1.0) -> np.ndarray:
    """Per-particle real-space CTF kernels, shape (N, n, m) float32.

    kernel_i = -fftshift(ifft2(CTF_i)).real over the fftfreq grid scaled by
    each particle's pixel size (ctf.py:33-56).
    """
    fi = np.fft.fftfreq(n)
    fj = np.fft.fftfreq(m)
    fi, fj = np.meshgrid(fi, fj, indexing="ij")
    freqs = np.stack([fi.ravel(), fj.ravel()], axis=1)

    out = np.zeros((len(ctf_params), n, m), dtype=np.float32)
    for i in range(len(ctf_params)):
        apix = ctf_params.apix[i] * scale
        c = compute_2d_ctf(
            freqs / apix,
            ctf_params.defocus[i] * 10000.0,   # dfu
            ctf_params.defocus[i] * 10000.0,   # dfv — dfdiff ignored (quirk)
            2.0 * np.pi * ctf_params.dfang[i] / 360.0,
            ctf_params.voltage[i],
            ctf_params.cs[i],
            ctf_params.ampcont[i] / 100.0,
            ctf_params.bfactor[i],
        ).reshape(n, m)
        out[i] = -np.fft.fftshift(np.fft.ifft2(c)).real
    return out
