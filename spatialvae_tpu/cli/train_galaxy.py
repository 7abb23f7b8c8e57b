"""Train spatial-VAE on galaxy (color) datasets — flag-compatible with
/root/reference/train_galaxy.py:297-343.

Workload-specific behaviours (SURVEY.md section 3.3): RGB channels threaded
through the whole pipeline, --make_mono / --invert_colours preprocessing,
pre-split shuffle, --num_train_images truncation, run.log file logging,
rotation augmentation with the uint8 round-trip, z-delay curriculum, and a
third image dump of prior samples ({E}_rnd_*.png).

Quirks replicated: validation uses the test file (the val_split path is
disabled upstream, train_galaxy.py:378-381); the 'leakyrelu' activation
choice falls through to tanh ('leakrelu' dispatch typo,
train_galaxy.py:429).
"""

from __future__ import annotations

import argparse
import logging
import math
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

LOGGING_LEVELS = {"CRITICAL": 50, "ERROR": 40, "WARNING": 30, "INFO": 20,
                  "DEBUG": 10, "NOTSET": 0}


def logging_level(name: str) -> int:
    return LOGGING_LEVELS.get(name.upper(), 20)


def print_and_log_info(logger, text: str):
    print(text)
    logger.info(text)


def galaxy_arguments(argv=None):
    parser = argparse.ArgumentParser("Train spatial-VAE on galaxy datasets")

    parser.add_argument("train_path", help="path to training data")
    parser.add_argument("test_path", help="path to testing data")

    add_arg(parser, "-z", "--z_dim", type=int, default=2,
            help="latent variable dimension (default: 2)")
    add_arg(parser, "--p_hidden_dim", type=int, default=500,
            help="dimension of hidden layers (default: 500)")
    add_arg(parser, "--p_num_layers", type=int, default=2,
            help="number of hidden layers (default: 2)")
    add_arg(parser, "--q_hidden_dim", type=int, default=5000,
            help="dimension of hidden layers (default: 5000)")
    add_arg(parser, "--q_num_layers", type=int, default=2,
            help="number of hidden layers (default: 2)")
    add_arg(parser, "-a", "--activation",
            choices=["tanh", "relu", "leakyrelu", "sigmoid"], default="tanh",
            help="activation function (default: tanh)")
    add_arg(parser, "--vanilla", action="store_true",
            help="use the standard MLP generator architecture")
    add_arg(parser, "--no_rotate", action="store_true",
            help="do not perform rotation inference")
    add_arg(parser, "--no_translate", action="store_true",
            help="do not perform translation inference")

    # --dx-prior is the upstream-paper spelling for the same quantity
    # (SURVEY.md section 5.6; BASELINE.json config #2 names it explicitly)
    add_arg(parser, "--dx_scale", "--dx-prior", type=float, default=0.1,
            help="standard deviation of translation latent variables "
                 "(default: 0.1)")
    add_arg(parser, "--theta_prior", type=float, default=np.pi,
            help="standard deviation on rotation prior (default: pi)")

    add_arg(parser, "-l", "--learning_rate", type=float, default=1e-4,
            help="learning rate (default: 0.0001)")
    add_arg(parser, "--minibatch_size", type=int, default=100,
            help="minibatch size (default: 100)")

    add_arg(parser, "--augment_rotation", action="store_true",
            help="use data augmentation by randomly rotating images before "
                 "inference")
    add_arg(parser, "--z_delay", type=int, default=0,
            help="delay using unstructured latent variables for this many "
                 "training epochs (default: 0)")

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
    add_arg(parser, "--make_mono", action="store_true",
            help="convert rbg images to monochrome")
    add_arg(parser, "--logging_level", type=str, default="INFO",
            help="logging level (default: INFO")
    add_arg(parser, "--invert_colours", action="store_true",
            help="convert images to negatives")
    add_common_extras(parser)
    return parser.parse_args(argv)


def main(argv=None):
    args = galaxy_arguments(argv)
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
    from spatialvae_tpu.transforms.coords import coord_grid

    outputs = RunOutputs(args.save_prefix)
    outputs.write_command(vars(args))
    num_epochs = args.num_epochs
    digits = int(math.log10(num_epochs)) + 1

    logging.basicConfig(filename=f"{outputs.output_dir}/run.log",
                        format="%(asctime)s %(levelname)s:%(message)s",
                        datefmt="%Y%m%d %H:%M:%S", filemode="w",
                        level=logging_level(args.logging_level),
                        force=True)
    logger = logging.getLogger()
    print_and_log_info(logger, "Started")

    print("# loading data...", file=sys.stderr)
    images_train = np.load(args.train_path)
    images_val = np.load(args.test_path)

    channels = 3
    if args.make_mono:
        images_train = np.mean(images_train, axis=3)
        channels = 1

    rng = np.random.RandomState(args.seed)
    rng.shuffle(images_train)
    if args.num_train_images > 0:
        images_train = images_train[:args.num_train_images]
        images_val = images_val[:args.num_train_images]
    # validation deliberately uses the test file (train_galaxy.py:378-381)

    n, m = images_train.shape[1:3]
    image_dims = [n, m]

    images_train = images_train.astype(np.float32) / 255.0
    images_val = images_val.astype(np.float32) / 255.0
    if args.invert_colours:
        images_train = 1.0 - images_train
        images_val = 1.0 - images_val

    y_train = images_train.reshape(-1, n * m, channels)
    y_val = images_val.reshape(-1, n * m, channels)
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

        activation = resolve_activation_name(args.activation, "galaxy")
        if args.vanilla:
            print("# using the vanilla MLP generator architecture",
                  file=sys.stderr)
            p_cfg = VanillaGeneratorConfig(
                n=channels * n * m, latent_dim=z_dim,
                hidden_dim=args.p_hidden_dim, num_layers=args.p_num_layers,
                activation=activation)
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
                latent_dim=z_dim, hidden_dim=args.p_hidden_dim,
                n_out=channels, num_layers=args.p_num_layers,
                activation=activation)

        q_cfg = InferenceConfig(n=channels * n * m, latent_dim=inf_dim,
                                hidden_dim=args.q_hidden_dim,
                                num_layers=args.q_num_layers,
                                activation=activation)
        outputs.write_model_specs(
            [torch_style_repr(p_cfg), torch_style_repr(q_cfg)])

        print(f"# using priors: theta={args.theta_prior}, dx={args.dx_scale}",
              file=sys.stderr)

        ecfg = ElboConfig(rotate=rotate, translate=translate,
                          dx_scale=args.dx_scale,
                          theta_prior=args.theta_prior,
                          theta_mean_penalty=False,  # train_galaxy.py:99
                          likelihood="bernoulli", channels=channels,
                          vanilla=args.vanilla,
                          fused=_use_fused(args) and (mesh is None
                                 or mesh.shape.get("model", 1) == 1),
                          int8=args.int8_decoder)
        tcfg = TrainConfig(minibatch_size=args.minibatch_size,
                           learning_rate=args.learning_rate,
                           num_epochs=num_epochs, z_delay=args.z_delay,
                           augment_rotation=args.augment_rotation,
                           # the reference's float->uint8->PIL->float
                           # augmentation round-trip (train_galaxy.py:47-54)
                           augment_uint8=True,
                           seed=args.seed, compute_dtype=args.compute_dtype,
                           image_shape=(n, m), channels=channels)
        trainer = Trainer(q_cfg, p_cfg, ecfg, tcfg, coords, mesh=mesh,
                          tp_mode=args.tp_mode)
        start_epoch = maybe_resume(trainer, args)

        data_train = make_dataset(y_train, mesh=mesh)
        data_val = make_dataset(y_val, mesh=mesh)
        label = save_label(vars(args), args.save_prefix)
        save_interval = args.save_interval

        first = y_val[:args.minibatch_size]
        save_image_grid(first, f"{outputs.output_dir}/images/_sample_{label}"
                        ".png", image_dims)

        header = "\t".join(["Epoch", "ELBO", "BCE loss", "KL"])
        print(header)
        train_results, val_results = [], []
        train_lines, val_lines = [header], [header]

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
            z_scale = 0.0 if (epoch - 1) < args.z_delay else 1.0
            epoch_str = str(epoch).zfill(digits)
            va = trainer.eval_epoch(data_val, epoch - 1, z_scale=z_scale)
            if epoch % save_interval == 0:
                _dump_images(trainer, data_val, args.minibatch_size, z_dim,
                             z_scale, image_dims, outputs.output_dir,
                             epoch_str, label)
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
        outputs.finish()

        print_and_log_info(logger, "Finished")
        for hndlr in logger.handlers:
            hndlr.flush()
            hndlr.close()

        # archive INCLUDING the closed log (train_galaxy.py:566-571)
        outputs.archive()


def _dump_images(trainer, data_val, batch_size, z_dim, z_scale, image_dims,
                 output_dir, epoch_str, label):
    """Reconstruction + pose-stripped + prior-sample grids
    (train_galaxy.py:275-292)."""
    from spatialvae_tpu.io.png import save_image_grid

    y = data_val.y[:batch_size]
    y_hat = np.asarray(trainer.reconstruct(y, z_scale=z_scale))
    y_dis = np.asarray(trainer.reconstruct_canonical(y, z_scale=z_scale))
    y_rnd = np.asarray(trainer.sample_prior(y.shape[0], z_dim,
                                            z_scale=z_scale))
    save_image_grid(y_dis, f"{output_dir}/images/{epoch_str}_dis_{label}.png",
                    image_dims)
    save_image_grid(y_hat, f"{output_dir}/images/{epoch_str}_{label}.png",
                    image_dims)
    save_image_grid(y_rnd, f"{output_dir}/images/{epoch_str}_rnd_{label}.png",
                    image_dims)


if __name__ == "__main__":
    main()
