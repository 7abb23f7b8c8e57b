"""Shared CLI plumbing.

Flag-spelling parity: the reference's mnist/galaxy CLIs use underscores
(``--z_dim``) while particles uses dashes (``--z-dim``) — SURVEY.md section
5.6.  Every long flag here registers BOTH spellings as aliases, so either
form works on any CLI.

Device flag parity (train_mnist.py:322-332): ``-d -1`` forces CPU, ``-2``
(default) auto-selects the accelerator, ``>= 0`` picks that device index.
"""

from __future__ import annotations

import argparse
import contextlib

import jax


def add_arg(parser: argparse.ArgumentParser, name: str, *aliases, **kwargs):
    """Register a long flag under both dash and underscore spellings."""
    names = [name, *aliases]
    spellings = []
    for n in names:
        spellings.append(n)
        if n.startswith("--"):
            alt = ("--" + n[2:].replace("_", "-") if "_" in n
                   else "--" + n[2:].replace("-", "_"))
            if alt != n and alt not in spellings:
                spellings.append(alt)
    return parser.add_argument(*spellings, **kwargs)


def add_common_extras(parser: argparse.ArgumentParser):
    """Additive flags beyond the reference surface (documented in README)."""
    add_arg(parser, "--seed", type=int, default=0,
            help="PRNG seed (additive; reference RNG is unseeded)")
    add_arg(parser, "--compute-dtype", choices=["float32", "bfloat16"],
            default="float32",
            help="forward/backward compute precision (additive)")
    add_arg(parser, "--matmul-precision",
            choices=["default", "high", "highest"], default="highest",
            help="XLA f32 matmul precision (additive)")
    add_arg(parser, "--profile-dir", default=None,
            help="write a jax.profiler trace of epoch 1 here (additive)")
    add_arg(parser, "--mesh-model", type=int, default=1,
            help="model/pixel mesh axis size for multi-chip runs (additive)")
    add_arg(parser, "--coordinator", default=None,
            help="multi-host: coordinator address host:port for "
                 "jax.distributed.initialize (additive; on Cloud TPU pods "
                 "all three multi-host args are auto-detected — pass "
                 "--num-processes alone to opt in to auto-detection)")
    add_arg(parser, "--num-processes", type=int, default=None,
            help="multi-host: total number of processes in the run "
                 "(additive)")
    add_arg(parser, "--process-id", type=int, default=None,
            help="multi-host: this process's index in [0, num-processes) "
                 "(additive)")
    add_arg(parser, "--tp-mode", choices=["column", "row"],
            default="column",
            help="q first-layer tensor-parallel layout: 'column' shards "
                 "output features; 'row' shards the input-pixel dimension "
                 "(for images that outgrow one chip) (additive)")
    add_arg(parser, "--eval-interval", type=int, default=1,
            help="evaluate/dump every N epochs instead of every epoch "
                 "(additive; N>1 trains the epochs between evals as ONE "
                 "device dispatch — the multi-epoch in-graph scan — with "
                 "an identical training trajectory)")
    add_arg(parser, "--no-fused", action="store_true",
            help="disable the fused Pallas decoder kernel (additive)")
    add_arg(parser, "--int8-decoder", action="store_true",
            help="int8/int4-MXU training stack — the recommended TPU "
                 "speed mode (~2x bf16 throughput).  Measured 100-epoch "
                 "ELBO gap vs the bf16 path: 0.14%% max on smooth data, "
                 "~1.0%% worst-case on saturated galaxy-like data (vs a "
                 "0.46%% seed-to-seed trajectory-chaos floor; see "
                 "BASELINE.md round 5).  Use --int8-sr for guaranteed "
                 "<1%% tracking on long runs (additive)")
    add_arg(parser, "--int8-sr", action="store_true",
            help="with --int8-decoder: stochastic rounding at the "
                 "kernel's quantisation sites — unbiased int4/int8 "
                 "rounding for tighter long-horizon ELBO tracking "
                 "(100-epoch galaxy-proxy max gap 0.76%% vs 1.05%%) at "
                 "~10%% throughput cost (kernel 45.5 vs 40.8 ms/2048) "
                 "(additive)")
    add_arg(parser, "--adam-moments", choices=["f32", "bf16"],
            default="f32",
            help="Adam moment (mu/nu) storage dtype; bf16 halves the "
                 "optimizer-state HBM traffic with f32 arithmetic "
                 "(30-epoch ELBO gap vs f32 moments: max 0.135%%) "
                 "(additive)")
    add_arg(parser, "--debug-nans", action="store_true",
            help="enable jax debug_nans checking (additive)")
    add_arg(parser, "--resume-generator", default=None,
            help="resume: load generator params from this checkpoint "
                 "(additive; the reference has no resume path)")
    add_arg(parser, "--resume-inference", default=None,
            help="resume: load inference-net params from this checkpoint "
                 "(additive)")
    add_arg(parser, "--save-optimizer", action="store_true",
            help="also checkpoint Adam state (count/moments) alongside the "
                 "model checkpoints, enabling faithful resume (additive)")
    add_arg(parser, "--resume-optimizer", default=None,
            help="resume: restore Adam state + epoch index from this "
                 "optimizer checkpoint; training continues the exact "
                 "uninterrupted trajectory (additive)")


def _use_fused(args) -> bool:
    """Enable the fused Pallas decoder on TPU unless --no-fused."""
    if getattr(args, "no_fused", False):
        return False
    if getattr(args, "device", -2) == -1:
        return False                  # -d -1 forces CPU: no Pallas there
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def maybe_multihost(args) -> bool:
    """Join a multi-host run when any of the --coordinator /
    --num-processes / --process-id flags are given (SURVEY 5.8; the mesh
    then spans every process's devices).  Must run before the first
    jax.devices() call.  Returns True if initialization happened."""
    coord = getattr(args, "coordinator", None)
    nproc = getattr(args, "num_processes", None)
    pid = getattr(args, "process_id", None)
    if coord is None and nproc is None and pid is None:
        return False
    from spatialvae_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(coordinator_address=coord, num_processes=nproc,
                         process_id=pid)
    print(f"# multi-host: process {jax.process_index()} of "
          f"{jax.process_count()}, {len(jax.devices())} global devices")
    return True


def maybe_mesh(args):
    """Create a ('data', 'model') mesh when more than one device is visible
    (or --mesh-model asks for model parallelism); None on a single chip.
    Joins a multi-host run first when the multi-host flags are given."""
    multihost = maybe_multihost(args)
    model = getattr(args, "mesh_model", 1) or 1
    if not multihost and getattr(args, "device", 0) == -1:
        # -d -1 = CPU run (reference device semantics): pin the platform
        # BEFORE any device query so the accelerator backend is never
        # initialized — a CPU run must work even when the TPU plugin's
        # tunnel is unreachable (observed: jax.devices() here hung every
        # -d -1 CLI run during a tunnel outage)
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backends already up (in-process caller) — harmless
        if model <= 1:
            return None
        # an explicit --mesh-model N still gets its (CPU-device) mesh —
        # the virtual-device TP path stays testable with -d -1
    n = len(jax.devices())
    if n <= 1:
        return None
    from spatialvae_tpu.parallel import MeshConfig, create_mesh

    mesh = create_mesh(MeshConfig.auto(n_devices=n, model=model))
    print(f"# mesh: {dict(mesh.shape)}")
    return mesh


def make_dataset(y, ctf=None, mesh=None, preload=True):
    """ArrayDataset in HBM (sharded over the 'data' axis when a mesh is
    active and the image count divides evenly), or host-resident with
    per-step streaming when ``preload`` is False (--no-preload)."""
    import jax.numpy as jnp

    from spatialvae_tpu.data import ArrayDataset

    if not preload:
        return ArrayDataset.from_numpy(y, ctf, preload=False)
    sharding = None
    if mesh is not None and y.shape[0] % mesh.shape["data"] == 0:
        from spatialvae_tpu.parallel.sharding import batch_sharding

        sharding = batch_sharding(mesh)
    if sharding is not None:
        return ArrayDataset.from_numpy(y, ctf, sharding=sharding)
    return ArrayDataset(jnp.asarray(y),
                        None if ctf is None else jnp.asarray(ctf))


def maybe_resume(trainer, args) -> int:
    """Load generator/inference params (and optionally Adam state) from
    checkpoints into the trainer.  Returns the epoch to start from (0
    unless --resume-optimizer carries a later epoch index) so epoch loops
    — and the per-epoch shuffle/step keys derived from the epoch number —
    continue the exact uninterrupted trajectory."""
    from spatialvae_tpu.train.checkpoint import load_model, load_optimizer
    from spatialvae_tpu.train.trainer import TrainState

    # Adam moments/count only make sense paired with the params they were
    # optimizing: fresh random params + epoch-N moments (and a skipped
    # z-delay curriculum) is a silently-corrupt "resume" — fail fast
    if getattr(args, "resume_optimizer", None) and not (
            getattr(args, "resume_generator", None)
            and getattr(args, "resume_inference", None)):
        raise SystemExit(
            "--resume-optimizer requires BOTH --resume-generator and "
            "--resume-inference (optimizer moments belong to specific "
            "parameters)")

    params = dict(trainer.state.params)
    if getattr(args, "resume_generator", None):
        p, _, kind = load_model(args.resume_generator)
        assert kind == "generator", args.resume_generator
        params["p"] = p
        print(f"# resumed generator from {args.resume_generator}")
    if getattr(args, "resume_inference", None):
        p, _, kind = load_model(args.resume_inference)
        assert kind == "inference", args.resume_inference
        params["q"] = p
        print(f"# resumed inference net from {args.resume_inference}")
    if trainer.mesh is not None:
        # checkpoints load as host numpy arrays; without re-placement they
        # would silently replace the shard_params-placed tree with
        # replicated copies (a TP resume would replicate the q first
        # layer).  Re-apply the same layout the trainer's init used.
        from spatialvae_tpu.parallel.sharding import replicated, shard_params

        if getattr(trainer, "_spmd_pixel", False):
            # the pixel-sharded shard_map step keeps params replicated
            # (trainer.__init__ does the same at init)
            params = jax.device_put(params, replicated(trainer.mesh))
        else:
            params = shard_params(params, trainer.mesh, trainer.tp_mode)
    start_epoch = 0
    if getattr(args, "resume_optimizer", None):
        opt_state, epoch = load_optimizer(args.resume_optimizer)
        # the checkpoint stores moments in whatever dtype the SAVING run
        # used; honor THIS run's --adam-moments choice instead of silently
        # inheriting (fused_adam adapts to m.dtype, so without this cast
        # the flag would be a no-op on resume)
        import jax.numpy as jnp

        from spatialvae_tpu.train.optimizer import moments_dtype

        mdt = moments_dtype()
        old_dt = {leaf.dtype for leaf in jax.tree.leaves(opt_state.mu)}
        if old_dt - {jnp.dtype(mdt)}:
            print(f"# resumed Adam moments cast "
                  f"{'/'.join(sorted(str(d) for d in old_dt))} -> "
                  f"{jnp.dtype(mdt).name} (--adam-moments)")
            cast = lambda t: jax.tree.map(lambda a: a.astype(mdt), t)
            opt_state = opt_state._replace(mu=cast(opt_state.mu),
                                           nu=cast(opt_state.nu))
        if trainer.mesh is not None:
            # Adam moments are params-shaped: place them leaf-for-leaf
            # like the params they belong to
            from spatialvae_tpu.parallel.sharding import param_shardings

            sh = param_shardings(params, trainer.mesh, trainer.tp_mode)
            opt_state = opt_state._replace(
                mu=jax.device_put(opt_state.mu, sh),
                nu=jax.device_put(opt_state.nu, sh))
        start_epoch = epoch + 1
        print(f"# resumed optimizer state from {args.resume_optimizer} "
              f"(continuing at epoch {start_epoch + 1})")
    else:
        opt_state = trainer.optimizer.init(params)
    trainer.state = TrainState(params, opt_state)
    return start_epoch


def chunk_len(epoch: int, num_epochs: int, eval_interval: int,
              save_interval=None, profile_epoch=None) -> int:
    """Epochs to train before the next eval point: capped by the run end
    AND by the next save-interval boundary, so --eval-interval N never
    skips a checkpoint/image-dump epoch.  When a --profile-dir trace is
    pending (profile_epoch), epochs up to and including it run as
    single-epoch dispatches so the trace captures exactly one warm epoch
    — not the multi-epoch scan's compile plus the whole chunk."""
    chunk = max(1, min(eval_interval, num_epochs - epoch))
    if save_interval:
        chunk = min(chunk, save_interval - (epoch % save_interval))
    if profile_epoch is not None and epoch <= profile_epoch:
        chunk = 1
    return chunk


def train_chunk(trainer, dataset, epoch: int, num_epochs: int,
                eval_interval: int, save_interval=None,
                profile_epoch=None):
    """Train up to the next eval point; returns
    [(epoch_index, (elbo, gen_loss, kl)), ...] for epochs
    [epoch, epoch + chunk).

    eval_interval == 1 is the reference behavior (one epoch, progress
    line, then the caller evals).  For N > 1 the chunk of epochs runs as
    ONE device dispatch via Trainer.train_epochs (multi-epoch in-graph
    scan — same trajectory bit-for-bit, no per-epoch host round-trip)."""
    chunk = chunk_len(epoch, num_epochs, eval_interval, save_interval,
                      profile_epoch)
    if chunk == 1:
        return [(epoch, trainer.train_epoch(dataset, epoch))]
    rows = trainer.train_epochs(dataset, epoch, chunk)
    return [(epoch + i, tuple(float(v) for v in row))
            for i, row in enumerate(rows)]


def chunked_epochs(trainer, dataset, start_epoch: int, num_epochs: int,
                   eval_interval, save_interval=None, profile_dir=None):
    """Drive a whole training run in train_chunk-sized pieces, yielding
    (rows, next_epoch) per chunk, rows = [(epoch, (elbo, gen, kl)), ...].

    Owns the scaffolding the three trainers previously each duplicated
    (the round-3 tail-drift lesson: three copies of off-by-one-prone
    logic WILL diverge): the epoch cursor, and the --profile-dir trace
    around the chunk holding epoch 1 (a single warm epoch dispatch, see
    chunk_len).  stop_trace runs when the caller RESUMES the generator,
    so the caller's post-chunk eval/dump work lands inside the trace,
    exactly like the loops this replaces."""
    eval_interval = max(1, eval_interval or 1)
    profile_epoch = 1 if profile_dir is not None else None
    epoch = start_epoch
    while epoch < num_epochs:
        tracing = profile_dir is not None and epoch <= 1 < \
            epoch + chunk_len(epoch, num_epochs, eval_interval,
                              save_interval, profile_epoch)
        if tracing:
            jax.profiler.start_trace(profile_dir)
        rows = train_chunk(trainer, dataset, epoch, num_epochs,
                           eval_interval, save_interval, profile_epoch)
        epoch = rows[-1][0] + 1
        yield rows, epoch
        if tracing:
            jax.profiler.stop_trace()


@contextlib.contextmanager
def device_context(device_flag: int, matmul_precision: str = "highest",
                   debug_nans: bool = False, adam_moments: str = "f32",
                   int8_sr: bool = False):
    """Map the reference's -d flag onto JAX device selection."""
    import os

    from spatialvae_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_default_matmul_precision", matmul_precision)
    if debug_nans:
        jax.config.update("jax_debug_nans", True)
    # read by train.optimizer.moments_dtype at optimizer-state init.  Set
    # unconditionally (f32 included) and restore on exit: a previous
    # in-process run's bf16 setting must not leak into a run that asked
    # for the default
    prev_moments = os.environ.get("SPATIALVAE_ADAM_MOMENTS")
    os.environ["SPATIALVAE_ADAM_MOMENTS"] = adam_moments or "f32"
    # --int8-sr: an EXPLICIT user flag is the sanctioned path for this
    # numerics knob, so the guard opt-in is scoped alongside it (and
    # restored, so a stray env var still fails the next run's trainer
    # guard); SR itself is read by the kernel via KernelConfig.from_env
    prev_sr = (os.environ.get("SPATIALVAE_SR"),
               os.environ.get("SPATIALVAE_ALLOW_KNOBS"))
    if int8_sr:
        os.environ["SPATIALVAE_SR"] = "1"
        os.environ["SPATIALVAE_ALLOW_KNOBS"] = "1"
    try:
        if device_flag == -1:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                yield cpu
            return
        # local_devices, not the global list: under a multi-host join the
        # global list leads with process 0's devices, which are NOT
        # addressable from other processes — defaulting to jax.devices()[0]
        # crashed every rank > 0 at the first eager placement.  -d N also
        # means a LOCAL ordinal in the reference (torch.cuda device index).
        devices = jax.local_devices()
        idx = device_flag if device_flag >= 0 else 0
        dev = devices[min(idx, len(devices) - 1)]
        with jax.default_device(dev):
            yield dev
    finally:
        if prev_moments is None:
            os.environ.pop("SPATIALVAE_ADAM_MOMENTS", None)
        else:
            os.environ["SPATIALVAE_ADAM_MOMENTS"] = prev_moments
        for name, prev in zip(("SPATIALVAE_SR", "SPATIALVAE_ALLOW_KNOBS"),
                              prev_sr):
            if prev is None:
                os.environ.pop(name, None)
            else:
                os.environ[name] = prev


def resolve_activation_name(cli_choice: str, trainer: str) -> str:
    """Per-CLI activation dispatch parity.

    mnist/particles (train_mnist.py:344-348, train_particles.py:433-436):
    'tanh' -> tanh, 'relu' -> leakyrelu (torch LeakyReLU).
    galaxy (train_galaxy.py:426-434): 'tanh' -> tanh, 'relu' -> relu,
    'sigmoid' -> sigmoid, and 'leakyrelu' falls through to tanh because the
    dispatch tests the misspelling 'leakrelu' — replicated for parity.
    """
    if trainer in ("mnist", "particles"):
        return {"tanh": "tanh", "relu": "leakyrelu"}[cli_choice]
    if trainer == "galaxy":
        return {"tanh": "tanh", "relu": "relu", "sigmoid": "sigmoid",
                "leakyrelu": "tanh"}.get(cli_choice, "tanh")
    raise ValueError(trainer)
