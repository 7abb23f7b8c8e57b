"""Offline end-to-end test of the dataset download/extract/package chain
using a file:// URL (no network; SURVEY.md section 2.1 row 25)."""

import os
import tarfile

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _noninteractive(monkeypatch):
    monkeypatch.setenv("SPATIALVAE_ASSUME_YES", "1")


def _make_archive(tmp_path, name="toyset"):
    from PIL import Image

    src = tmp_path / "buildsrc" / name
    src.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            src / f"img{i}.jpg")
    archive = tmp_path / f"{name}.tar.gz"
    with tarfile.open(archive, "w:gz") as tar:
        tar.add(src, arcname=name)
    return archive


def test_download_dataset_from_file_url(tmp_path, monkeypatch):
    from spatialvae_tpu.data.download import download_dataset

    archive = _make_archive(tmp_path)
    data_dir = tmp_path / "data"
    url = f"file://{archive}"

    final_dir, working = download_dataset(
        data_dir=str(data_dir), replace_download=True,
        replace_unzip_content=True, src_url=url, is_isic=False)

    assert final_dir == os.path.join(str(data_dir), "toyset")
    assert len([f for f in os.listdir(final_dir)
                if f.endswith(".jpg")]) == 4
    assert os.path.exists(data_dir / "downloads" / "toyset.tar.gz")


def test_get_dataset_cli_end_to_end(tmp_path, monkeypatch):
    """The full get_dataset flow: download -> extract -> 64x64 npy package
    (get_dataset.py:54-66)."""
    from spatialvae_tpu.cli.get_dataset import main

    archive = _make_archive(tmp_path, name="galaxy_mini")
    data_dir = tmp_path / "data"
    main(["-d", str(data_dir), "-rd", "-ruc", "-s", f"file://{archive}"])

    npy = data_dir / "galaxy_mini.npy"
    assert npy.exists()
    arr = np.load(npy)
    assert arr.shape == (4, 64, 64, 3)


def test_spatial_vae_dataset_urls():
    from spatialvae_tpu.data.download import SPATIAL_VAE_DATASETS

    assert set(SPATIAL_VAE_DATASETS) == {
        "mnist_rotated", "mnist_rotated_translated", "5HDB", "codhacs",
        "antibody", "galaxy_zoo"}
    for url in SPATIAL_VAE_DATASETS.values():
        assert url.startswith(
            "http://bergerlab-downloads.csail.mit.edu/spatial-vae/")


def test_mnist_auto_download_via_file_mirror(tmp_path, monkeypatch):
    """--dataset mnist with no local data downloads the idx files (the
    reference fetches MNIST on first use, train_mnist.py:278-288).  Driven
    offline through a file:// mirror."""
    import gzip
    import struct

    import numpy as np

    from spatialvae_tpu.cli.train_mnist import load_mnist_arrays

    mirror = tmp_path / "mirror"
    mirror.mkdir()
    rng = np.random.default_rng(0)

    def write_idx(name, n):
        data = rng.integers(0, 256, size=(n, 8, 8), dtype=np.uint8)
        with gzip.open(mirror / name, "wb") as f:
            f.write(struct.pack(">IIII", 2051, n, 8, 8))
            f.write(data.tobytes())
        return data

    train = write_idx("train-images-idx3-ubyte.gz", 6)
    test = write_idx("t10k-images-idx3-ubyte.gz", 3)
    # labels are best-effort; leave them missing on the mirror

    monkeypatch.setenv("SPATIALVAE_MNIST_MIRROR", mirror.as_uri() + "/")
    data_root = tmp_path / "data"
    tr, te = load_mnist_arrays("mnist", data_root=str(data_root))
    np.testing.assert_array_equal(tr, train)
    np.testing.assert_array_equal(te, test)
    # files landed where the loader looks on the next run
    assert (data_root / "mnist" / "train-images-idx3-ubyte.gz").exists()

    # second call must not re-download (mirror gone -> still works)
    monkeypatch.setenv("SPATIALVAE_MNIST_MIRROR",
                       (tmp_path / "nonexistent").as_uri() + "/")
    tr2, _ = load_mnist_arrays("mnist", data_root=str(data_root))
    np.testing.assert_array_equal(tr2, train)
