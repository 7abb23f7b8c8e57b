"""Dataset download/extraction tooling (host-side).

Capability parity with /root/reference/src/download_helper.py:11-238 and
src/download_progress_bar.py: URL download with a tqdm progress bar,
skip/replace prompts (non-interactive safe), tar.gz/zip extraction through a
temp dir into ``data/<stem>/``, and the ISIC challenge naming convention.

Dataset URLs (reference README.md:20-27 / get_dataset.py:13-19):
mnist_rotated, mnist_rotated_translated, 5HDB, codhacs, antibody,
galaxy_zoo at http://bergerlab-downloads.csail.mit.edu/spatial-vae/.
"""

from __future__ import annotations

import os
import shutil
import sys
import tarfile
import urllib.request
import zipfile
from pathlib import Path

SPATIAL_VAE_DATASETS = {
    name: f"http://bergerlab-downloads.csail.mit.edu/spatial-vae/{name}.tar.gz"
    for name in ["mnist_rotated", "mnist_rotated_translated", "5HDB",
                 "codhacs", "antibody", "galaxy_zoo"]
}


def _ask(question: str) -> bool:
    if os.environ.get("SPATIALVAE_ASSUME_YES") == "1" or not sys.stdin.isatty():
        return True
    return input(question)[:1].lower() == "y"


def can_download(target_path: str, replace_download=None) -> bool:
    if Path(target_path).is_file():
        if replace_download is None:
            replace_download = _ask(
                f"File {target_path} exists, replace it (y/n and enter)?")
        result = bool(replace_download)
        print(f'Overwriting "{target_path}".' if result
              else f'Not replacing "{target_path}".')
        return result
    print(f'Saving new file "{target_path}".')
    return True


def can_extract(unzip_dir: str, replace_content=False) -> bool:
    if unzip_dir and Path(unzip_dir).is_dir() and os.listdir(unzip_dir):
        if replace_content is None:
            replace_content = _ask(
                f"Files exist in {unzip_dir}, replace them (y/n and enter)?")
        result = bool(replace_content)
        print(f"Will replace {unzip_dir}." if result
              else f'Will not replace content of "{unzip_dir}".')
        return result
    print(f"Saving files at {unzip_dir}.")
    return True


def download_url(url: str, target_path: str) -> None:
    Path(target_path).parent.mkdir(parents=True, exist_ok=True)
    try:
        from tqdm import tqdm

        class _Bar(tqdm):
            def update_to(self, b=1, bsize=1, tsize=None):
                if tsize is not None:
                    self.total = tsize
                self.update(b * bsize - self.n)

        with _Bar(unit="B", unit_scale=True, miniters=1,
                  desc=url.split("/")[-1]) as t:
            urllib.request.urlretrieve(url, filename=target_path,
                                       reporthook=t.update_to)
    except ImportError:
        urllib.request.urlretrieve(url, filename=target_path)


def extraction_dir_for(data_dir: str, filename: str) -> str:
    """data/<archive stem>/ for .zip/.tar/.tar.gz archives."""
    p = Path(filename.lower())
    if p.name.endswith(".tar.gz"):
        stem = Path(Path(p.name).stem).stem
    elif p.suffix in (".zip", ".tar"):
        stem = p.stem
    else:
        raise ValueError(f"{p.name} is not a handled archive type.")
    return os.path.join(data_dir, stem)


def isic_extraction_dir_for(data_dir: str, filename: str) -> str:
    """ISIC challenge convention: directory named after the split kind."""
    filename = filename.lower()
    kinds = ("training_input", "training_groundtruth", "validation_input",
             "validation_groundtruth", "test_input")
    for kind in kinds:
        for suffix in ("zip", "tar"):
            if filename.endswith(f"{kind}.{suffix}"):
                return os.path.join(data_dir, kind)
    return ""


def download_dataset(data_dir: str, replace_download, replace_unzip_content,
                     src_url: str, is_isic: bool = False,
                     working_dir: str = ""):
    """Download + extract ``src_url`` under ``data_dir``.

    Returns (final_extraction_dir, working_dir)."""
    print(f"Parameters: \ndata_dir: {data_dir}\n"
          f"replace_download: {replace_download}\n"
          f"replace_unzip_content: {replace_unzip_content}\n"
          f"src_url: {src_url}\nis_isic: {is_isic}\n"
          f"working_dir: {working_dir}")

    name = Path(src_url).name
    file_type = ".tar.gz" if name.endswith(".tar.gz") else Path(src_url).suffix
    download_file = os.path.join(data_dir, "downloads", name)
    working = data_dir if working_dir == "" else os.path.join(data_dir,
                                                              working_dir)
    final_dir = (isic_extraction_dir_for(working, name) if is_isic
                 else extraction_dir_for(working, name))

    temp_dir = os.path.join(data_dir, "temp")
    if Path(temp_dir).exists():
        shutil.rmtree(temp_dir)

    extract_ok = (False if final_dir == ""
                  else can_extract(final_dir, replace_unzip_content))
    do_download = ((final_dir == "" or extract_ok)
                   and can_download(download_file, replace_download))
    if do_download and final_dir and Path(final_dir).is_dir():
        print(f"Removing dir {final_dir}.")
        shutil.rmtree(final_dir)
        download_url(src_url, download_file)
    elif do_download:
        download_url(src_url, download_file)

    if extract_ok:
        Path(temp_dir).mkdir(parents=True, exist_ok=True)
        if file_type == ".tar.gz":
            with tarfile.open(download_file, "r:gz") as tar:
                print(f"Extracting {download_file} to {temp_dir}")
                tar.extractall(path=temp_dir)
                top = Path(tar.getmembers()[0].name).parts[0]
        elif file_type in (".tar", ".zip"):
            with zipfile.ZipFile(download_file, "r") as zf:
                print(f"Extracting {zf.filename} to {temp_dir}")
                zf.extractall(path=temp_dir)
                top = Path(zf.filelist[0].filename).parts[0]
        else:
            return final_dir, working
        if Path(final_dir).exists():
            print(f"Removing dir tree {final_dir}")
            shutil.rmtree(final_dir)
        src = os.path.join(temp_dir, top)
        print(f'Moving dir "{src}" to "{final_dir}"')
        Path(final_dir).parent.mkdir(parents=True, exist_ok=True)
        os.rename(src, final_dir)

    return final_dir, working


# --- MNIST idx download (train_mnist.py --dataset mnist) --------------------

# torchvision is not in this image; the reference downloads MNIST on first
# use via torchvision.datasets.MNIST(download=True)
# (/root/reference/train_mnist.py:278-288).  These are the same files from
# the same mirrors torchvision uses.
MNIST_MIRRORS = (
    "https://ossci-datasets.s3.amazonaws.com/mnist/",
    "http://yann.lecun.com/exdb/mnist/",
)
MNIST_IMAGE_FILES = ("train-images-idx3-ubyte.gz", "t10k-images-idx3-ubyte.gz")
MNIST_LABEL_FILES = ("train-labels-idx1-ubyte.gz", "t10k-labels-idx1-ubyte.gz")


def download_mnist_idx(dest_dir: str, mirrors=None) -> bool:
    """Fetch the MNIST idx .gz files into ``dest_dir``.

    Returns True when both image files are present afterwards.  Label files
    are fetched best-effort for parity with torchvision's layout (the
    trainer is unsupervised and never reads them).  ``mirrors`` (or the
    SPATIALVAE_MNIST_MIRROR env var) overrides the mirror list — file:// URLs
    work, which is how the offline test fixture drives this."""
    env_mirror = os.environ.get("SPATIALVAE_MNIST_MIRROR")
    if mirrors is None:
        mirrors = (env_mirror,) if env_mirror else MNIST_MIRRORS
    Path(dest_dir).mkdir(parents=True, exist_ok=True)

    def fetch(fname: str) -> bool:
        target = os.path.join(dest_dir, fname)
        if os.path.exists(target):
            return True
        for base in mirrors:
            url = base + fname if base.endswith("/") else f"{base}/{fname}"
            try:
                download_url(url, target)
                return True
            except Exception as e:
                print(f"# mnist: download of {url} failed: {e}",
                      file=sys.stderr)
                if os.path.exists(target):
                    os.remove(target)          # drop partial file
        return False

    ok = all([fetch(f) for f in MNIST_IMAGE_FILES])
    for f in MNIST_LABEL_FILES:
        fetch(f)
    return ok
