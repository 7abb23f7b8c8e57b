"""Float64 numpy oracles for the reference semantics.

These re-state the published spatial-VAE math (arXiv:1909.11663, reference
files cited per-function) in plain numpy so the JAX implementation can be
checked against an independent high-precision computation.
"""

from __future__ import annotations

import numpy as np


def linear(p, x):
    y = x @ p["w"].astype(np.float64)
    if "b" in p:
        y = y + p["b"].astype(np.float64)
    return y


ACTS = {
    "tanh": np.tanh,
    "relu": lambda x: np.maximum(x, 0.0),
    "leakyrelu": lambda x: np.where(x >= 0, x, 0.01 * x),
    "sigmoid": lambda x: 1.0 / (1.0 + np.exp(-x)),
}


def softplus(x):
    return np.logaddexp(0.0, x)


def inference_net(params, cfg, y):
    """models.py:24-54 oracle."""
    act = ACTS[cfg.activation]
    layers = params["layers"]
    x = y.astype(np.float64)
    for i, p in enumerate(layers[:-1]):
        h = linear(p, x)
        if cfg.resid and i > 0:
            h = h + x
        x = act(h)
    z = linear(layers[-1], x)
    ld = cfg.latent_dim
    return z[:, :ld], z[:, ld:]


def spatial_generator(params, cfg, x, z):
    """models.py:57-132 oracle.  x: (B, HW, 2), z: (B, Z) or None."""
    act = ACTS[cfg.activation]
    x = x.astype(np.float64)
    if cfg.expand_coords:
        xy = (x[..., 0] * x[..., 1])[..., None]
        x = np.concatenate([x, x * x, xy], axis=-1)
    h = linear(params["coord"], x)
    if cfg.latent_dim > 0 and z is not None:
        z = z.astype(np.float64)
        h = h + (z @ params["latent"]["w"].astype(np.float64))[:, None, :]
        if cfg.bilinear:
            w = params["bilinear"]["w"].astype(np.float64)
            h = h + np.einsum("bpi,bj,ijo->bpo", x,
                              z, w, optimize=True)
    out = act(h)
    for p in params["layers"][:-1]:
        y = linear(p, out)
        if cfg.resid:
            y = y + out
        out = act(y)
    y = ACTS["sigmoid"](linear(params["layers"][-1], out))
    if cfg.softplus:
        y = np.concatenate([softplus(y[..., :1]), y[..., 1:]], axis=-1)
    return y


def vanilla_generator(params, cfg, z):
    """models.py:135-172 oracle, including the double-softplus quirk."""
    act = ACTS[cfg.activation]
    x = z.astype(np.float64)
    layers = params["layers"]
    for i, p in enumerate(layers[:-1]):
        h = linear(p, x)
        if cfg.resid and i > 0:
            h = h + x
        x = act(h)
    y = ACTS["sigmoid"](linear(layers[-1], x))
    if cfg.softplus:
        y = softplus(y)
    y = y.reshape(z.shape[0], -1, cfg.n_out)
    if cfg.softplus:
        y = np.concatenate([softplus(y[..., :1]), y[..., 1:]], axis=-1)
    return y


def elbo_reference(q_params, q_cfg, p_params, p_cfg, ecfg, coords, y, r,
                   offsets=None, z_scale=1.0, ctf=None, mask=None,
                   image_shape=None):
    """Oracle for the unified ELBO, mirroring eval_minibatch semantics
    (train_mnist.py:24-90 / train_particles.py:22-148 /
    train_galaxy.py:27-128) in float64.
    """
    b = y.shape[0]
    y = y.astype(np.float64)
    z_mu, z_logstd = inference_net(q_params, q_cfg, y.reshape(b, -1))
    z_std = np.exp(z_logstd)
    z = z_std * r.astype(np.float64) + z_mu

    kl = np.zeros(b)
    theta = None
    dx = None
    x = np.broadcast_to(coords[None].astype(np.float64),
                        (b,) + coords.shape).copy()

    rotate = ecfg.rotate and not ecfg.vanilla
    translate = ecfg.translate and not ecfg.vanilla

    if rotate:
        theta_mu, theta_std, theta_logstd = z_mu[:, 0], z_std[:, 0], z_logstd[:, 0]
        theta = z[:, 0]
        z, z_mu, z_std, z_logstd = z[:, 1:], z_mu[:, 1:], z_std[:, 1:], z_logstd[:, 1:]
        if offsets is not None:
            theta = theta + offsets
        # x @ [[c, s], [-s, c]]  (train_mnist.py:54-59)
        c, s = np.cos(theta), np.sin(theta)
        x0, x1 = x[..., 0], x[..., 1]
        x = np.stack([x0 * c[:, None] - x1 * s[:, None],
                      x0 * s[:, None] + x1 * c[:, None]], axis=-1)
        sig = ecfg.theta_prior
        klr = -theta_logstd + np.log(sig) + theta_std ** 2 / 2 / sig ** 2 - 0.5
        if ecfg.theta_mean_penalty:
            klr = klr + theta_mu ** 2 / 2 / sig ** 2
        kl += klr

    if translate:
        dx = z[:, :2] * ecfg.dx_scale
        z = z[:, 2:]
        x = x + dx[:, None, :]

    z = z * z_scale

    if ecfg.vanilla:
        y_hat = vanilla_generator(p_params, p_cfg, z)
    else:
        y_hat = spatial_generator(p_params, p_cfg, x, z)

    if ecfg.likelihood == "bernoulli":
        t = y.reshape(b, -1)
        p = y_hat.reshape(b, -1)
        log_p = np.clip(np.log(p), -100.0, None)
        log_1mp = np.clip(np.log1p(-p), -100.0, None)
        logp = np.sum(t * log_p + (1 - t) * log_1mp) / b
    else:
        yf = y.reshape(b, -1)
        hw = yf.shape[1]
        yp = y_hat.reshape(b, -1)
        if yp.shape[1] > hw:
            y_mu, y_logvar = yp[:, :hw], yp[:, hw:]
            y_var = np.exp(y_logvar)
        else:
            y_mu, y_logvar, y_var = yp, None, None
        if ctf is not None:
            n, m = image_shape
            y_mu = _conv_same_corr(y_mu.reshape(b, n, m), ctf).reshape(b, hw)
            if y_var is not None:
                y_var = _conv_same_corr(y_var.reshape(b, n, m), ctf).reshape(b, hw)
        per = (y_mu - yf) ** 2
        if y_var is not None:
            per = per / y_var + y_logvar
        if mask is not None:
            c = per.shape[1] // mask.shape[0]
            mflat = np.repeat(mask, c) if c > 1 else mask
            per = per * mflat[None, :]
        logp = -0.5 * np.sum(per, axis=1).mean()

    zkl = -z_logstd + 0.5 * z_std ** 2 + 0.5 * z_mu ** 2 - 0.5
    kl = kl + zkl.sum(axis=1)
    kl = kl.mean()
    return logp - kl, logp, kl


def _conv_same_corr(y, k):
    """Per-image 'same' cross-correlation with zero padding (torch conv2d)."""
    b, n, m = y.shape
    kn, km = k.shape[1], k.shape[2]
    pn, pm = kn // 2, km // 2
    out = np.zeros_like(y)
    yp = np.pad(y, ((0, 0), (pn, pn), (pm, pm)))
    for i in range(b):
        for r in range(n):
            for c in range(m):
                out[i, r, c] = np.sum(yp[i, r:r + kn, c:c + km] * k[i])
    return out
