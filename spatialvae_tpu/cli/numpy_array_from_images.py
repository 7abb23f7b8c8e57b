"""Generate a numpy archive from a directory of images — flag-compatible
with /root/reference/numpy_array_from_images.py:17-27 (including the RAM
warning prompt, skipped when non-interactive).
"""

from __future__ import annotations

import argparse

from spatialvae_tpu.cli.common import add_arg
from spatialvae_tpu.train.artifacts import confirm_or_exit


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Generate a numpy archive from a directory of images")
    add_arg(parser, "--source_dir", "-s", type=str,
            help="Source directory with images")
    add_arg(parser, "--target_path", "-t", type=str,
            help="Base path (no extension) for array to be saved")
    add_arg(parser, "--new_shape", "-sh", type=tuple, default=0,
            help="Tuple of shape, in form (rows, columns); "
                 "(optional, default 0)")
    add_arg(parser, "--suffix", "-e", type=str,
            help="Extension suffix including period/full-stop "
                 "(default '.jpg')")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    confirm_or_exit(
        "WARNING May require a lot of memory - e.g. ISIC2018 Challenge "
        "Task 3 Training data needs over 30GB. \nContinue (y/n and Enter)?")
    for k, v in vars(args).items():
        print(f"{k}={v or ''}")

    from spatialvae_tpu.data.packaging import (
        create_numpy_archive_from_images_dir,
    )

    result = create_numpy_archive_from_images_dir(
        src_dir=args.source_dir, target_path=args.target_path,
        new_shape=args.new_shape, suffix=args.suffix)
    print(result)


if __name__ == "__main__":
    main()
