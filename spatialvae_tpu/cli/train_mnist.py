"""Train spatial-VAE on MNIST datasets — flag-compatible with
/root/reference/train_mnist.py:229-265.

Differences from the reference are TPU-architectural only: the epoch loop is
one jitted lax.scan (see spatialvae_tpu.train.trainer) and checkpoints are
framework-native pickles under the same filenames.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import numpy as np

from spatialvae_tpu.cli.common import (
    _use_fused,
    make_dataset,
    maybe_mesh,
    maybe_resume,
    add_arg,
    add_common_extras,
    chunked_epochs,
    device_context,
    resolve_activation_name,
)


def mnist_arguments(argv=None):
    parser = argparse.ArgumentParser("Train spatial-VAE on MNIST datasets")

    add_arg(parser, "--dataset",
            choices=["mnist", "mnist-rotated", "mnist-rotated-translated",
                     "galaxy"],
            default="mnist-rotated-translated",
            help="which MNIST datset to train/validate on "
                 "(default: mnist-rotated-translated)")

    add_arg(parser, "-z", "--z_dim", type=int, default=2,
            help="latent variable dimension (default: 2)")
    add_arg(parser, "--p_hidden_dim", type=int, default=500,
            help="dimension of hidden layers (default: 500)")
    add_arg(parser, "--q_hidden_dim", type=int, default=500,
            help="dimension of hidden layers (default: 500)")
    add_arg(parser, "--num_layers", type=int, default=2,
            help="number of hidden layers (default: 2)")
    add_arg(parser, "-a", "--activation", choices=["tanh", "relu"],
            default="tanh", help="activation function (default: tanh)")

    add_arg(parser, "--vanilla", action="store_true",
            help="use the standard MLP generator architecture, decoding each "
                 "pixel with an independent function. disables structured "
                 "rotation and translation inference")
    add_arg(parser, "--no_rotate", action="store_true",
            help="do not perform rotation inference")
    add_arg(parser, "--no_translate", action="store_true",
            help="do not perform translation inference")

    # --dx-prior is the upstream-paper spelling for the same quantity
    # (SURVEY.md section 5.6; BASELINE.json config #2 names it explicitly)
    add_arg(parser, "--dx_scale", "--dx-prior", type=float, default=0.1,
            help="standard deviation of translation latent variables "
                 "(default: 0.1)")
    add_arg(parser, "--theta_prior", type=float, default=np.pi / 4,
            help="standard deviation on rotation prior (default: pi/4)")

    add_arg(parser, "-l", "--learning_rate", type=float, default=1e-4,
            help="learning rate (default: 0.0001)")
    add_arg(parser, "--minibatch_size", type=int, default=100,
            help="minibatch size (default: 100)")

    add_arg(parser, "--save_prefix", help="path prefix to save models "
                                          "(optional)")
    add_arg(parser, "--save_interval", default=10, type=int,
            help="save frequency in epochs (default: 10)")
    add_arg(parser, "--num_epochs", type=int, default=100,
            help="number of training epochs (default: 100)")

    add_arg(parser, "-d", "--device", type=int, default=-2,
            help="compute device to use")
    add_arg(parser, "--num_train_images", type=int, default=0,
            help="number of training images (default: 0 = all)")
    add_arg(parser, "--val_split", type=int, default=50,
            help="%% split of training images for validation instead of "
                 "training (default: 50)")
    add_common_extras(parser)
    return parser.parse_args(argv)


def _load_mnist_idx(root: str):
    """Read raw MNIST idx3-ubyte image files (optionally .gz) so the
    'mnist' dataset works without torchvision (it is not in this image)."""
    import gzip
    import struct

    def read_images(name):
        for base in (root, os.path.join(root, "MNIST", "raw")):
            for suffix, opener in (("", open), (".gz", gzip.open)):
                path = os.path.join(base, name + suffix)
                if os.path.exists(path):
                    with opener(path, "rb") as f:
                        magic, n, rows, cols = struct.unpack(
                            ">IIII", f.read(16))
                        if magic != 2051:
                            return None
                        data = np.frombuffer(f.read(n * rows * cols),
                                             dtype=np.uint8)
                        return data.reshape(n, rows, cols)
        return None

    train = read_images("train-images-idx3-ubyte")
    test = read_images("t10k-images-idx3-ubyte")
    if train is not None and test is not None:
        return train, test
    return None


def load_mnist_arrays(dataset: str, data_root: str = "data"):
    if dataset == "mnist":
        print("# training on MNIST", file=sys.stderr)
        try:
            import torchvision
            tr = torchvision.datasets.MNIST(f"{data_root}/mnist/", train=True,
                                            download=True)
            te = torchvision.datasets.MNIST(f"{data_root}/mnist/",
                                            train=False, download=True)
            train = np.stack([np.array(im, copy=False) for im, _ in tr])
            test = np.stack([np.array(im, copy=False) for im, _ in te])
            return train, test
        except Exception as e:  # torchvision absent (this image) / offline
            npy = f"{data_root}/mnist/images_train.npy"
            if os.path.exists(npy):
                return (np.load(npy),
                        np.load(f"{data_root}/mnist/images_test.npy"))
            idx = _load_mnist_idx(f"{data_root}/mnist")
            if idx is not None:
                return idx
            # download the raw idx files ourselves — the reference fetches
            # MNIST on first use (train_mnist.py:278-288)
            from spatialvae_tpu.data.download import download_mnist_idx
            if download_mnist_idx(f"{data_root}/mnist"):
                idx = _load_mnist_idx(f"{data_root}/mnist")
                if idx is not None:
                    return idx
            raise RuntimeError(
                f"MNIST download unavailable ({e}); place images_train.npy/"
                f"images_test.npy or the raw idx files under "
                f"{data_root}/mnist/") from e
    if dataset == "mnist-rotated":
        print("# training on rotated MNIST", file=sys.stderr)
        return (np.load(f"{data_root}/mnist_rotated/images_train.npy"),
                np.load(f"{data_root}/mnist_rotated/images_test.npy"))
    if dataset == "galaxy":
        print("# training on mono-chromed galaxy_zoo", file=sys.stderr)
        train = np.load(f"{data_root}/galaxy_zoo/galaxy_zoo_train.npy")
        test = np.load(f"{data_root}/galaxy_zoo/galaxy_zoo_test.npy")
        return np.mean(train, axis=3), np.mean(test, axis=3)
    print("# training on rotated and translated MNIST", file=sys.stderr)
    return (
        np.load(f"{data_root}/mnist_rotated_translated/images_train.npy"),
        np.load(f"{data_root}/mnist_rotated_translated/images_test.npy"))


def main(argv=None):
    args = mnist_arguments(argv)
    run(args)


def run(args):
    from spatialvae_tpu.core.config import (
        InferenceConfig,
        SpatialGeneratorConfig,
        VanillaGeneratorConfig,
    )
    from spatialvae_tpu.io.png import save_image_grid
    from spatialvae_tpu.models import torch_style_repr
    from spatialvae_tpu.objectives import ElboConfig
    from spatialvae_tpu.train import Trainer, TrainConfig
    from spatialvae_tpu.train.artifacts import RunOutputs, save_label
    from spatialvae_tpu.train.checkpoint import save_trained_models
    from spatialvae_tpu.train.plots import basic_run_plot

    outputs = RunOutputs(args.save_prefix)
    outputs.write_command(vars(args))
    num_epochs = args.num_epochs
    digits = int(math.log10(num_epochs)) + 1

    images_train, images_test = load_mnist_arrays(args.dataset)
    n, m = images_train.shape[1:3]
    image_dims = [n, m]
    y_train = images_train.astype(np.float32).reshape(-1, n * m) / 255.0
    y_test = images_test.astype(np.float32).reshape(-1, n * m) / 255.0

    from spatialvae_tpu.transforms.coords import coord_grid
    coords = coord_grid(n, m)

    # multi-host join (maybe_mesh -> jax.distributed.initialize) must
    # happen BEFORE the first backend-initializing JAX call, which
    # device_context's jax.devices() would otherwise be
    mesh = maybe_mesh(args)
    with device_context(args.device, args.matmul_precision,
                        args.debug_nans, args.adam_moments,
                        int8_sr=args.int8_sr):
        z_dim = args.z_dim
        print("# training with z-dim:", z_dim, file=sys.stderr)

        activation = resolve_activation_name(args.activation, "mnist")
        if args.vanilla:
            print("# using the vanilla MLP generator architecture",
                  file=sys.stderr)
            p_cfg = VanillaGeneratorConfig(
                n=n * m, latent_dim=z_dim, hidden_dim=args.p_hidden_dim,
                num_layers=args.num_layers, activation=activation)
            rotate = translate = False
            inf_dim = z_dim
        else:
            print("# using the spatial generator architecture",
                  file=sys.stderr)
            rotate = not args.no_rotate
            translate = not args.no_translate
            inf_dim = z_dim
            if rotate:
                print("# spatial-VAE with rotation inference", file=sys.stderr)
                inf_dim += 1
            if translate:
                print("# spatial-VAE with translation inference",
                      file=sys.stderr)
                inf_dim += 2
            p_cfg = SpatialGeneratorConfig(
                latent_dim=z_dim, hidden_dim=args.p_hidden_dim, n_out=1,
                num_layers=args.num_layers, activation=activation)

        q_cfg = InferenceConfig(n=n * m, latent_dim=inf_dim,
                                hidden_dim=args.q_hidden_dim,
                                num_layers=args.num_layers,
                                activation=activation)
        outputs.write_model_specs(
            [torch_style_repr(p_cfg), torch_style_repr(q_cfg)])

        print(f"# using priors: theta={args.theta_prior}, dx={args.dx_scale}",
              file=sys.stderr)

        ecfg = ElboConfig(rotate=rotate, translate=translate,
                          dx_scale=args.dx_scale,
                          theta_prior=args.theta_prior,
                          theta_mean_penalty=True,   # train_mnist.py:63
                          likelihood="bernoulli", vanilla=args.vanilla,
                          fused=_use_fused(args) and (mesh is None
                                 or mesh.shape.get("model", 1) == 1),
                          int8=args.int8_decoder)
        tcfg = TrainConfig(minibatch_size=args.minibatch_size,
                           learning_rate=args.learning_rate,
                           num_epochs=num_epochs, seed=args.seed,
                           compute_dtype=args.compute_dtype,
                           image_shape=(n, m))
        trainer = Trainer(q_cfg, p_cfg, ecfg, tcfg, coords, mesh=mesh,
                          tp_mode=args.tp_mode)
        start_epoch = maybe_resume(trainer, args)

        data_train = make_dataset(y_train, mesh=mesh)
        data_test = make_dataset(y_test, mesh=mesh)
        label = save_label(vars(args), args.save_prefix)
        save_interval = args.save_interval

        # input-sample dump before training (misc_tools.py:42-46)
        first = y_test[:args.minibatch_size]
        save_image_grid(first, f"{outputs.output_dir}/images/_sample_{label}"
                        ".png", image_dims)

        header = "\t".join(["Epoch", "ELBO", "BCE loss", "KL"])
        print(header)
        train_results, val_results = [], []
        train_lines, val_lines = [header], [header]

        # reference behavior at eval_interval=1: eval every epoch;
        # N>1 evals only at chunk boundaries (additive flag)
        for rows, epoch in chunked_epochs(
                trainer, data_train, start_epoch, num_epochs,
                getattr(args, "eval_interval", 1), save_interval,
                args.profile_dir):
            for e, tr in rows:
                row = [e, *tr]
                train_results.append(row)
                line = "\t".join(map(str, row))
                train_lines.append(line)
                print(line, flush=True)
            va = trainer.eval_epoch(data_test, epoch - 1)
            epoch_str = str(epoch).zfill(digits)
            if epoch % save_interval == 0:
                _dump_images(trainer, data_test, args.minibatch_size,
                             image_dims, outputs.output_dir, epoch_str, label)
            row = [epoch - 1, *va]
            val_results.append(row)
            line = "\t".join(map(str, row))
            val_lines.append(line)
            print(line, flush=True)

        # blocking: the zip archive below must include the checkpoints
        save_trained_models(args.save_prefix, num_epochs - 1, digits, 1,
                            outputs.trained_dir,
                            trainer.state.params["p"], p_cfg,
                            trainer.state.params["q"], q_cfg,
                            async_write=False, elbo=trainer.ecfg,
                            image_shape=trainer.tcfg.image_shape)

        # gate on the prefix like the model save (prefix None would
        # f-string a literal 'None_optimizer_*.sav' with no matching
        # model checkpoints — unusable for resume)
        if args.save_optimizer and not args.save_prefix:
            import sys as _sys
            print("# WARNING: --save-optimizer ignored: no "
                  "--save_prefix, so there are no model "
                  "checkpoints for the optimizer state to pair "
                  "with", file=_sys.stderr)
        if args.save_optimizer and args.save_prefix:
            from spatialvae_tpu.train.checkpoint import (
                optimizer_path,
                save_optimizer,
            )

            save_optimizer(
                optimizer_path(args.save_prefix, num_epochs - 1, digits,
                               outputs.trained_dir),
                trainer.state.opt_state, num_epochs - 1)
        basic_run_plot(train_results, val_results,
                       output_dir=outputs.images_dir)
        outputs.write_results(train_lines, val_lines)
        outputs.archive()
        outputs.finish()


def _dump_images(trainer, data_test, batch_size, image_dims, output_dir,
                 epoch_str, label):
    """Reconstruction + pose-stripped grids for the first val batch
    (train_mnist.py:214-224)."""
    import numpy as np

    y = data_test.y[:batch_size]
    y_hat = np.asarray(trainer.reconstruct(y))
    y_dis = np.asarray(trainer.reconstruct_canonical(y))
    from spatialvae_tpu.io.png import save_image_grid
    save_image_grid(y_dis, f"{output_dir}/images/{epoch_str}_dis_{label}.png",
                    image_dims)
    save_image_grid(y_hat, f"{output_dir}/images/{epoch_str}_{label}.png",
                    image_dims)


if __name__ == "__main__":
    main()
