"""Training-dynamics parity vs a PyTorch implementation of the reference
semantics (SURVEY.md section 4.5, BASELINE.json: "ELBO trajectories must
match the PyTorch reference within tolerance").

A torch-functional replica of eval_minibatch (train_mnist.py:24-90) +
torch.optim.Adam is driven with the SAME initial weights, the SAME batch
order, and the SAME reparameterisation noise as our jitted step.  ELBO
trajectories and post-update parameters must agree step-by-step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch
import torch.nn.functional as TF

from spatialvae_tpu.core.config import InferenceConfig, SpatialGeneratorConfig
from spatialvae_tpu.models import inference_init, spatial_generator_init
from spatialvae_tpu.objectives import ElboConfig, elbo_minibatch
from spatialvae_tpu.transforms.coords import coord_grid


@pytest.fixture(autouse=True)
def _torch_float64():
    """The oracle runs in float64; restore the global default afterwards so
    other test modules (which build float32 reference models) are unaffected."""
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(prev)


def _torch_params(jx_params):
    """jax param pytree -> flat list of torch leaf tensors (requires_grad)."""
    leaves, treedef = jax.tree_util.tree_flatten(jx_params)
    tleaves = [torch.tensor(np.asarray(l), requires_grad=True)
               for l in leaves]
    return tleaves, treedef


def _torch_elbo(tq, tp, q_cfg, p_cfg, ecfg, coords, y, r):
    """Reference eval_minibatch semantics in torch (mnist variant)."""
    b = y.shape[0]

    # inference MLP: [Linear, tanh] * L, Linear -> 2*latent
    x = y
    q_layers = tq
    for w, bb in zip(q_layers[0::2][:-1], q_layers[1::2][:-1]):
        x = torch.tanh(x @ w + bb)
    z_out = x @ q_layers[-2] + q_layers[-1]
    ld = q_cfg.latent_dim
    z_mu, z_logstd = z_out[:, :ld], z_out[:, ld:]
    z_std = torch.exp(z_logstd)
    z = z_std * r + z_mu

    # pose slots
    theta = z[:, 0]
    theta_mu, theta_std, theta_logstd = z_mu[:, 0], z_std[:, 0], z_logstd[:, 0]
    z, z_mu, z_std, z_logstd = z[:, 1:], z_mu[:, 1:], z_std[:, 1:], z_logstd[:, 1:]
    sigma = ecfg.theta_prior
    kl = (-theta_logstd + np.log(sigma)
          + (theta_std ** 2 + theta_mu ** 2) / 2 / sigma ** 2 - 0.5)

    dx = z[:, :2] * ecfg.dx_scale
    z = z[:, 2:]

    c, s = torch.cos(theta), torch.sin(theta)
    x0 = coords[None, :, 0]
    x1 = coords[None, :, 1]
    xr0 = x0 * c[:, None] - x1 * s[:, None] + dx[:, :1]
    xr1 = x0 * s[:, None] + x1 * c[:, None] + dx[:, 1:2]

    # spatial generator: coord_w (2,H), coord_b, latent_w (Z,H), hidden, head
    coord_w, coord_b, latent_w = tp[0], tp[1], tp[2]
    h = (xr0[..., None] * coord_w[0] + xr1[..., None] * coord_w[1]
         + coord_b + (z @ latent_w)[:, None, :])
    h = torch.tanh(h)
    rest = tp[3:]
    for w, bb in zip(rest[0::2][:-1], rest[1::2][:-1]):
        h = torch.tanh(h @ w + bb)
    y_hat = torch.sigmoid(h @ rest[-2] + rest[-1])
    y_hat = y_hat.reshape(b, -1)

    size = y.shape[1]
    log_p = -TF.binary_cross_entropy(y_hat, y) * size

    z_kl = -z_logstd + 0.5 * z_std ** 2 + 0.5 * z_mu ** 2 - 0.5
    kl = (kl + z_kl.sum(dim=1)).mean()
    return log_p - kl, log_p, kl


@pytest.mark.slow
def test_adam_trajectory_matches_torch():
    n = m = 10
    z_dim = 2
    inf_dim = z_dim + 3
    lr = 1e-3
    steps = 12
    batch = 20

    q_cfg = InferenceConfig(n=n * m, latent_dim=inf_dim, hidden_dim=24,
                            num_layers=2)
    p_cfg = SpatialGeneratorConfig(latent_dim=z_dim, hidden_dim=24,
                                   num_layers=2)
    ecfg = ElboConfig(rotate=True, translate=True, dx_scale=0.1,
                      theta_prior=np.pi / 4, theta_mean_penalty=True,
                      likelihood="bernoulli")

    kq, kp, kd = jax.random.split(jax.random.PRNGKey(0), 3)
    q_params = inference_init(kq, q_cfg)
    p_params = spatial_generator_init(kp, p_cfg)
    coords = jnp.asarray(coord_grid(n, m))

    rng = np.random.RandomState(0)
    batches = rng.rand(steps, batch, n * m).astype(np.float32)
    noises = rng.randn(steps, batch, inf_dim).astype(np.float32)

    # ---- jax side: grad + optax.adam ----------------------------------
    import optax

    params = {"q": q_params, "p": p_params}
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(params, y, r):
        elbo, *_ = elbo_minibatch(params["q"], params["p"], q_cfg, p_cfg,
                                  ecfg, coords, y, None, noise=r)
        return -elbo

    @jax.jit
    def step(params, opt_state, y, r):
        loss, grads = jax.value_and_grad(loss_fn)(params, y, r)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jax_losses = []
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(batches[i]),
                                       jnp.asarray(noises[i]))
        jax_losses.append(float(loss))

    # ---- torch side: same weights, same data, same noise --------------
    def flat_linears(layers):
        out = []
        for p in layers:
            out.append(torch.tensor(np.asarray(p["w"], dtype=np.float64),
                                    requires_grad=True))
            out.append(torch.tensor(np.asarray(p["b"], dtype=np.float64),
                                    requires_grad=True))
        return out

    tq = flat_linears(q_params["layers"])
    tp = [torch.tensor(np.asarray(p_params["coord"]["w"], dtype=np.float64),
                       requires_grad=True),
          torch.tensor(np.asarray(p_params["coord"]["b"], dtype=np.float64),
                       requires_grad=True),
          torch.tensor(np.asarray(p_params["latent"]["w"], dtype=np.float64),
                       requires_grad=True)]
    tp += flat_linears(p_params["layers"])

    optim = torch.optim.Adam(tq + tp, lr=lr)
    torch_losses = []
    for i in range(steps):
        y = torch.tensor(batches[i], dtype=torch.float64)
        r = torch.tensor(noises[i], dtype=torch.float64)
        elbo, _, _ = _torch_elbo(tq, tp, q_cfg, p_cfg, ecfg,
                                 torch.tensor(np.asarray(coords),
                                              dtype=torch.float64), y, r)
        loss = -elbo
        loss.backward()
        optim.step()
        optim.zero_grad()
        torch_losses.append(float(loss))

    # trajectories must match closely (f32 vs f64 torch oracle)
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4)

    # final parameters agree too
    w_jax = np.asarray(params["q"]["layers"][0]["w"])
    w_torch = tq[0].detach().numpy()
    np.testing.assert_allclose(w_jax, w_torch, atol=5e-5)
