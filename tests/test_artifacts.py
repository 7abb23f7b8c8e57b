"""Artifacts, metrics, plots, and download-helper unit tests."""

import os
import sys

import numpy as np
import pytest

from spatialvae_tpu.data.download import (
    extraction_dir_for,
    isic_extraction_dir_for,
)
from spatialvae_tpu.train.artifacts import (
    RunOutputs,
    ensure_empty_directory,
    save_command_args_to_file,
)
from spatialvae_tpu.train.metrics import StreamingMeans
from spatialvae_tpu.train.plots import legend_location


@pytest.fixture(autouse=True)
def _noninteractive(monkeypatch):
    monkeypatch.setenv("SPATIALVAE_ASSUME_YES", "1")


def test_streaming_means_match_weighted_average():
    rng = np.random.RandomState(0)
    sizes = [32, 32, 32, 17]
    vals = rng.randn(4, 3)
    acc = StreamingMeans()
    for s, v in zip(sizes, vals):
        acc.update(s, *v)
    w = np.asarray(sizes, dtype=float)
    expect = (vals * w[:, None]).sum(0) / w.sum()
    np.testing.assert_allclose([acc.elbo, acc.gen_loss, acc.kl], expect,
                               rtol=1e-12)


def test_progress_template_format():
    acc = StreamingMeans()
    acc.update(10, -100.5, 100.2, 0.3)
    line = acc.progress_line(0, 5, 100)
    assert line.startswith("# [1/5] training 10.0%, ELBO=-100.50000")
    assert "Error=100.20000" in line and "KL=0.30000" in line


def test_run_outputs_tree_and_archive(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = RunOutputs("unit")
    assert os.path.isdir("outputs_unit/trained")
    assert os.path.isdir("outputs_unit/images")
    out.write_results(["h", "row1"], ["h", "rowA"])
    assert open("outputs_unit/train.txt").read() == "h\nrow1\n"
    out.archive()
    zips = [f for f in os.listdir(".") if f.endswith("_outputs_unit.zip")]
    assert len(zips) == 1

    # re-creating empties the tree
    open("outputs_unit/stale.txt", "w").write("x")
    RunOutputs("unit")
    assert not os.path.exists("outputs_unit/stale.txt")


def test_command_txt_format(tmp_path, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["train_mnist.py", "--z_dim", "2"])
    path = tmp_path / "command.txt"
    save_command_args_to_file({"z_dim": 2, "save_prefix": None}, str(path))
    lines = path.read_text().splitlines()
    assert lines[0] == "python train_mnist.py --z_dim 2"
    assert lines[1] == ""                     # invocation's trailing newline
    assert "z_dim=2" in lines
    assert "save_prefix=" in lines            # None renders empty


def test_ensure_empty_directory_nested(tmp_path):
    d = tmp_path / "x"
    (d / "sub").mkdir(parents=True)
    (d / "sub" / "f.txt").write_text("1")
    (d / "top.txt").write_text("2")
    ensure_empty_directory(str(d))
    assert list(d.iterdir()) == []


def test_legend_location_heuristic():
    # rising then flattening curve (typical ELBO): slope1 > slope2 -> lower
    curve = np.concatenate([np.linspace(0, 10, 10), np.full(10, 10.0)])
    assert legend_location(curve) == "lower right"
    # short series falls back to upper center
    assert legend_location(np.array([1.0, 2.0, 3.0])) == "upper center"


def test_extraction_dir_paths():
    assert extraction_dir_for("data", "galaxy_zoo.tar.gz") == \
        os.path.join("data", "galaxy_zoo")
    assert extraction_dir_for("data", "foo.zip") == os.path.join("data", "foo")
    with pytest.raises(ValueError):
        extraction_dir_for("data", "foo.rar")
    assert isic_extraction_dir_for(
        "data", "ISIC2018_Task3_Training_Input.zip") == \
        os.path.join("data", "training_input")
    assert isic_extraction_dir_for("data", "unrelated.zip") == ""


def test_packaging_images_dir(tmp_path):
    from PIL import Image

    from spatialvae_tpu.data.packaging import (
        create_numpy_archive_from_images_dir,
    )

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray((rng.rand(20, 24, 3) * 255).astype(np.uint8)).save(
            src / f"im{i}.jpg")
    out = create_numpy_archive_from_images_dir(
        str(src), str(tmp_path / "pack"), new_shape=(8, 8), suffix=".jpg")
    assert "saved" in out
    arr = np.load(tmp_path / "pack.npy")
    assert arr.shape == (3, 8, 8, 3)

    # empty-dir / bad-dir messages
    assert "no npy file created" in create_numpy_archive_from_images_dir(
        "", "x")
    assert "not a directory" in create_numpy_archive_from_images_dir(
        str(tmp_path / "nope"), "x")
