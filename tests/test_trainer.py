"""Trainer-level behaviour tests: mixed precision, eval correctness,
augmented training, error handling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialvae_tpu.core.config import InferenceConfig, SpatialGeneratorConfig
from spatialvae_tpu.data import ArrayDataset
from spatialvae_tpu.objectives import ElboConfig, elbo_minibatch
from spatialvae_tpu.train import Trainer, TrainConfig
from spatialvae_tpu.transforms.coords import coord_grid


def _trainer(n=8, batch=16, compute_dtype="float32", augment=False,
             seed=0, z_delay=0, augment_uint8=False):
    q_cfg = InferenceConfig(n=n * n, latent_dim=5, hidden_dim=16,
                            num_layers=2)
    p_cfg = SpatialGeneratorConfig(latent_dim=2, hidden_dim=16, num_layers=2)
    ecfg = ElboConfig(likelihood="bernoulli", theta_prior=np.pi)
    tcfg = TrainConfig(minibatch_size=batch, num_epochs=2, seed=seed,
                       compute_dtype=compute_dtype, image_shape=(n, n),
                       augment_rotation=augment, z_delay=z_delay,
                       augment_uint8=augment_uint8)
    return Trainer(q_cfg, p_cfg, ecfg, tcfg, coord_grid(n, n))


def test_bfloat16_training_runs_and_improves():
    t = _trainer(compute_dtype="bfloat16")
    rng = np.random.RandomState(0)
    data = ArrayDataset(jnp.asarray(rng.rand(64, 64).astype(np.float32)))
    e0 = t.train_epoch(data, 0, progress=False)[0]
    for epoch in range(1, 6):
        e1 = t.train_epoch(data, epoch, progress=False)[0]
    assert np.isfinite(e0) and np.isfinite(e1)
    assert e1 > e0
    # params stay float32 (mixed precision: cast only inside the loss)
    assert t.state.params["q"]["layers"][0]["w"].dtype == jnp.float32


def test_train_epochs_matches_sequential():
    """train_epochs (one dispatch, epochs scanned in-graph) must reproduce
    the sequential train_epoch trajectory: same permutations, same step
    keys, same z-delay schedule."""
    t_seq = _trainer()
    t_one = _trainer()
    rng = np.random.RandomState(2)
    y = jnp.asarray(rng.rand(64, 64).astype(np.float32))
    data = ArrayDataset(y)
    rows = [t_seq.train_epoch(data, e, progress=False) for e in range(3)]
    m = t_one.train_epochs(data, 0, 3)
    assert m.shape == (3, 3)
    np.testing.assert_allclose(m, np.asarray(rows), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(t_seq.state.params),
                    jax.tree_util.tree_leaves(t_one.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # continuing with per-epoch training from the scanned state works
    e3 = t_one.train_epoch(data, 3, progress=False)[0]
    assert np.isfinite(e3)


def test_train_epochs_zdelay_matches_sequential():
    """The z-delay curriculum is derived IN-GRAPH by train_epochs
    (e < z_delay); it must reproduce the host-side schedule exactly,
    including the epoch where z turns on."""
    t_seq = _trainer(z_delay=2)
    t_one = _trainer(z_delay=2)
    rng = np.random.RandomState(4)
    data = ArrayDataset(jnp.asarray(rng.rand(64, 64).astype(np.float32)))
    rows = [t_seq.train_epoch(data, e, progress=False) for e in range(3)]
    m = t_one.train_epochs(data, 0, 3)
    assert m.dtype == np.float64
    np.testing.assert_allclose(m, np.asarray(rows), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(t_seq.state.params),
                    jax.tree_util.tree_leaves(t_one.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_train_epochs_tail_fallback():
    """A dataset with a trailing partial batch falls back to the
    sequential path (the scan needs static full batches)."""
    t = _trainer()
    rng = np.random.RandomState(3)
    data = ArrayDataset(jnp.asarray(rng.rand(40, 64).astype(np.float32)))
    m = t.train_epochs(data, 0, 2)
    assert m.shape == (2, 3) and np.all(np.isfinite(m))


def test_augmented_training_runs():
    t = _trainer(augment=True)
    rng = np.random.RandomState(1)
    data = ArrayDataset(jnp.asarray(rng.rand(48, 64).astype(np.float32)))
    elbo, gen, kl = t.train_epoch(data, 0, progress=False)
    assert np.isfinite(elbo)


def test_galaxy_uint8_augment_quantises_view(monkeypatch):
    """The galaxy trainer's augmented inference view sits exactly on the
    /255 grid (the reference rotates a float->uint8 PIL view and divides
    back by 255, train_galaxy.py:47-54); without augment_uint8 the rotated
    floats are off-grid."""
    import spatialvae_tpu.train.trainer as trainer_mod

    captured = {}
    real = trainer_mod.elbo_minibatch

    def spy(*args, **kw):
        captured["y_inf"] = kw.get("y_inf")
        return real(*args, **kw)

    monkeypatch.setattr(trainer_mod, "elbo_minibatch", spy)
    rng = np.random.RandomState(5)
    y = jnp.asarray(
        np.round(rng.rand(16, 64).astype(np.float32) * 255.0) / 255.0)
    key = jax.random.PRNGKey(0)

    t = _trainer(augment=True, augment_uint8=True)
    t._loss(t.state.params, y, None, key, 1.0)
    v = np.asarray(captured["y_inf"], np.float64) * 255.0
    np.testing.assert_allclose(v, np.round(v), atol=1e-3)
    assert v.min() >= 0.0 and v.max() <= 255.0

    t2 = _trainer(augment=True)
    t2._loss(t2.state.params, y, None, key, 1.0)
    v2 = np.asarray(captured["y_inf"], np.float64) * 255.0
    assert np.abs(v2 - np.round(v2)).max() > 1e-3   # pin isn't vacuous


def test_eval_never_augments():
    """Parity: the reference's eval_model never rotates inputs
    (train_particles.py:204-228 takes no augment_rotation) — eval metrics
    must be identical with augment_rotation on/off at fixed params."""
    t_aug = _trainer(augment=True, seed=7)
    t_plain = _trainer(augment=False, seed=7)
    rng = np.random.RandomState(4)
    data = ArrayDataset(jnp.asarray(rng.rand(32, 64).astype(np.float32)))
    m_aug = t_aug.eval_epoch(data, epoch=0)
    m_plain = t_plain.eval_epoch(data, epoch=0)
    np.testing.assert_allclose(m_aug, m_plain, rtol=1e-6)


def test_eval_epoch_matches_manual_elbo():
    """eval_epoch's weighted mean must equal recomputing elbo_minibatch
    per batch with the same keys."""
    t = _trainer(batch=16)
    rng = np.random.RandomState(2)
    data = ArrayDataset(jnp.asarray(rng.rand(40, 64).astype(np.float32)))

    elbo, gen, kl = t.eval_epoch(data, epoch=3)

    # manual: two full batches of 16 + tail of 8, sequential order
    key = jax.random.fold_in(t.base_key, 1_000_000_007 + 3)
    zs = jnp.asarray(1.0, jnp.float32)
    total, count = 0.0, 0
    k = key
    for start, size in [(0, 16), (16, 16)]:
        k, sub = jax.random.split(k)
        e, *_ = elbo_minibatch(t.state.params["q"], t.state.params["p"],
                               t.q_cfg, t.p_cfg, t.ecfg, t.coords,
                               data.y[start:start + size], sub, z_scale=zs)
        total += float(e) * size
        count += size
    k_tail = jax.random.fold_in(key, 2)
    e, *_ = elbo_minibatch(t.state.params["q"], t.state.params["p"],
                           t.q_cfg, t.p_cfg, t.ecfg, t.coords,
                           data.y[32:40], k_tail, z_scale=zs)
    total += float(e) * 8
    count += 8
    np.testing.assert_allclose(elbo, total / count, rtol=1e-5)


def test_optimizer_resume_reproduces_trajectory(tmp_path):
    """Interrupt-resume with persisted Adam state must continue the exact
    uninterrupted trajectory (bias correction / moments do not restart)."""
    from spatialvae_tpu.train.checkpoint import (
        load_model,
        load_optimizer,
        save_model,
        save_optimizer,
    )
    from spatialvae_tpu.train.trainer import TrainState

    rng = np.random.RandomState(5)
    data = ArrayDataset(jnp.asarray(rng.rand(64, 64).astype(np.float32)))

    t_full = _trainer(seed=5)
    full = [t_full.train_epoch(data, e, progress=False) for e in range(4)]

    t_a = _trainer(seed=5)
    for e in range(2):
        t_a.train_epoch(data, e, progress=False)
    gen = str(tmp_path / "g.sav")
    inf = str(tmp_path / "i.sav")
    opt = str(tmp_path / "o.sav")
    save_model(gen, "generator", t_a.state.params["p"], t_a.p_cfg)
    save_model(inf, "inference", t_a.state.params["q"], t_a.q_cfg)
    save_optimizer(opt, t_a.state.opt_state, epoch=1)

    t_b = _trainer(seed=5)
    p, _, _ = load_model(gen)
    q, _, _ = load_model(inf)
    opt_state, epoch = load_optimizer(opt)
    assert epoch == 1
    t_b.state = TrainState({"q": q, "p": p}, opt_state)
    resumed = [t_b.train_epoch(data, e, progress=False)
               for e in range(epoch + 1, 4)]
    np.testing.assert_allclose(np.asarray(resumed), np.asarray(full[2:]),
                               rtol=2e-5)


def test_load_model_rejects_garbage(tmp_path):
    from spatialvae_tpu.train.checkpoint import load_model

    bad = tmp_path / "bad.sav"
    bad.write_bytes(b"not a checkpoint")
    with pytest.raises(Exception):
        load_model(str(bad))

    import pickle

    wrong = tmp_path / "wrong.sav"
    wrong.write_bytes(pickle.dumps({"format": "other"}))
    with pytest.raises(ValueError):
        load_model(str(wrong))


def test_nan_warning_emitted(capsys):
    """Divergence detection: a poisoned dataset triggers the warning."""
    t = _trainer()
    data = ArrayDataset(jnp.full((32, 64), jnp.nan))
    t.train_epoch(data, 0, progress=False)
    err = capsys.readouterr().err
    assert "non-finite training metrics" in err


def test_no_preload_streaming_matches_preloaded_shapes():
    """Host-resident (--no-preload) training runs and improves; metrics are
    finite and the parameter pytree matches the preloaded layout."""
    t = _trainer(batch=16)
    rng = np.random.RandomState(3)
    data_np = rng.rand(40, 64).astype(np.float32)
    host = ArrayDataset.from_numpy(data_np, preload=False)
    assert host.host_resident
    e0 = t.train_epoch(host, 0, progress=False)[0]
    e1 = t.train_epoch(host, 1, progress=False)[0]
    assert np.isfinite(e0) and np.isfinite(e1)
    ev = t.eval_epoch(host, 0)
    assert np.isfinite(ev[0])


def test_no_preload_streaming_matches_preloaded_trajectory():
    """Streamed (--no-preload) and preloaded epochs now share batches AND
    per-step keys (the streamed path replays the scan body's split
    chain), so a full epoch's metrics and params agree to XLA fusion-
    reassociation tolerance."""
    rng = np.random.RandomState(3)
    data_np = rng.rand(48, 64).astype(np.float32)
    ts = _trainer(batch=16)
    tp = _trainer(batch=16)
    ms = ts.train_epoch(ArrayDataset.from_numpy(data_np, preload=False), 0,
                        progress=False)
    mp = tp.train_epoch(ArrayDataset(jnp.asarray(data_np)), 0,
                        progress=False)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(mp), rtol=2e-3)
    for a, b in zip(jax.tree.leaves(ts.state.params),
                    jax.tree.leaves(tp.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_no_preload_eval_matches_preloaded():
    """eval_epoch must draw the same reparameterisation noise on both
    data paths: the streamed loop replays eval_epoch_scan's split chain
    (it used fold_in(key, i) before, so --no-preload eval metrics were
    not reproducible against a preloaded run's)."""
    rng = np.random.RandomState(4)
    data_np = rng.rand(40, 64).astype(np.float32)   # 2 full + tail of 8
    t = _trainer(batch=16)
    es = t.eval_epoch(ArrayDataset.from_numpy(data_np, preload=False), 0)
    ep = t.eval_epoch(ArrayDataset(jnp.asarray(data_np)), 0)
    np.testing.assert_allclose(np.asarray(es), np.asarray(ep), rtol=2e-3)


def test_no_preload_streaming_feeds_same_sorted_batches():
    """The streamed (--no-preload) path must feed the SAME within-batch-
    sorted index batches as the preloaded scan (round 4's sorted gathers
    apply to both), so the two paths stay semantically aligned.  Exact
    metric equality is NOT asserted: the scan-inlined step and the
    standalone jitted step fuse differently (measured ~1e-4 reassociation
    noise per step on CPU)."""

    class RecordingArray:
        def __init__(self, a):
            self.a = a
            self.calls = []

        def __getitem__(self, idx):
            self.calls.append(np.asarray(idx))
            return self.a[idx]

        def __getattr__(self, name):
            return getattr(self.a, name)

    rng = np.random.RandomState(3)
    data_np = rng.rand(32, 64).astype(np.float32)
    t = _trainer(batch=16)
    host = ArrayDataset.from_numpy(data_np, preload=False)
    rec = RecordingArray(host.y)
    host.y = rec
    t.train_epoch(host, 0, progress=False)

    perm = jax.random.permutation(jax.random.fold_in(t.base_key, 0), 32)
    expected, _, num_full, _ = t._index_batches(32, perm)
    assert len(rec.calls) == num_full
    for got, want in zip(rec.calls, np.asarray(expected)):
        assert (np.diff(got) >= 0).all()          # sorted ascending
        np.testing.assert_array_equal(got, want)  # identical batches
