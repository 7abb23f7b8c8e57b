"""Unit coverage for tools/real_data_parity.py (the round-5 real-data
end-to-end harness, docs/PARITY.md "Real-data end-to-end run"): the idx
packaging must round-trip through the CLI's idx decoder, on the /255
grid, with the documented split.  The full two-stack run is a tool
(CPU ~3 min), exercised manually and recorded in PARITY.md.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_digits_idx_round_trips_through_cli_loader(tmp_path):
    sklearn = pytest.importorskip("sklearn")           # noqa: F841
    from sklearn.datasets import load_digits

    import real_data_parity as rdp
    from spatialvae_tpu.cli.train_mnist import _load_mnist_idx

    data_dir = str(tmp_path / "mnist")
    rdp.build_digits_idx(data_dir)
    out = _load_mnist_idx(data_dir)
    assert out is not None
    train, test = out
    imgs = load_digits().images
    assert train.shape == (rdp.TRAIN_N, 8, 8)
    assert test.shape == (len(imgs) - rdp.TRAIN_N, 8, 8)
    # exact uint8 quantisation of the real scans, split preserved
    ref = np.round(imgs * (255.0 / 16.0)).astype(np.uint8)
    np.testing.assert_array_equal(train, ref[: rdp.TRAIN_N])
    np.testing.assert_array_equal(test, ref[rdp.TRAIN_N:])
    # idempotent (the tool caches the files)
    rdp.build_digits_idx(data_dir)
    np.testing.assert_array_equal(_load_mnist_idx(data_dir)[0], train)
