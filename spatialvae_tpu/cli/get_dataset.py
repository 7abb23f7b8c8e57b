"""Download + package a training dataset — flag-compatible with
/root/reference/get_dataset.py:35-51.

Downloads the archive, extracts under data/<stem>/, then packages any .jpg
files into a 64x64 .npy (get_dataset.py:54-66).  Spatial-VAE dataset URLs
are listed in spatialvae_tpu.data.download.SPATIAL_VAE_DATASETS.
"""

from __future__ import annotations

import argparse

from spatialvae_tpu.cli.common import add_arg

DOWNLOAD_URL = ("https://isic-challenge-data.s3.amazonaws.com/2018/"
                "ISIC2018_Task3_Training_LesionGroupings.csv")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Download the target training dataset")
    add_arg(parser, "--data_dir", "-d", type=str,
            help="Path to the root target data director")
    add_arg(parser, "--replace_download", "-rd", action="store_true",
            help="Flag to overwrite existing download file")
    add_arg(parser, "--replace_unzip_content", "-ruc", action="store_true",
            help="Flag to replace existing unzip folder content")
    add_arg(parser, "--src_url", "-s", type=str, default=DOWNLOAD_URL,
            help="Source URL for download")
    add_arg(parser, "--is_isic", "-i", action="store_true",
            help="Indicate download is an ISIC dataset following ISIC "
                 "conventions")
    add_arg(parser, "--working_dir", "-wd", type=str, default="",
            help="Target directory for extraction etc (optional)")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from spatialvae_tpu.data.download import download_dataset
    from spatialvae_tpu.data.packaging import (
        create_numpy_archive_from_images_dir,
    )

    extraction_dir, _ = download_dataset(
        data_dir=args.data_dir,
        replace_download=args.replace_download,
        replace_unzip_content=args.replace_unzip_content,
        src_url=args.src_url, is_isic=args.is_isic,
        working_dir=args.working_dir)

    result = create_numpy_archive_from_images_dir(
        src_dir=extraction_dir, target_path=extraction_dir,
        new_shape=(64, 64), suffix=".jpg")
    print(result)


if __name__ == "__main__":
    main()
