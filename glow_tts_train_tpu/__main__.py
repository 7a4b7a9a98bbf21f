#!/usr/bin/env python3
"""Training CLI.

Argument/behavior parity with reference `__main__.py:25-295` (same flags:
--output, repeatable --dataset <speaker_id> <phonemes_csv> <mels>, --mels-dir,
--config, --batch-size, --checkpoint, --git-commit, --checkpoint-epochs,
--skip-missing-mels, --debug), with TPU-native differences:

* no --local_rank / process launcher: JAX discovers all local devices; the
  mesh is built over them and multi-host runs initialize via
  ``jax.distributed`` environment variables (--coordinator for multi-host)
* num_symbols auto-detection actually works (the reference reads the
  variable before assignment, __main__.py:123 — a latent NameError)
* resume restores the full optimizer state, continuing the Noam curve
"""

import argparse
import logging
import random
import sys
from pathlib import Path

_LOGGER = logging.getLogger("glow_tts_train_tpu")


def main():
    parser = argparse.ArgumentParser(prog="glow-tts-train-tpu")
    parser.add_argument(
        "--output", required=True, help="Directory to store model artifacts"
    )
    parser.add_argument(
        "--dataset",
        required=True,
        nargs=3,
        action="append",
        default=[],
        metavar=("speaker_id", "phonemes_csv", "mels"),
        help="Speaker id, phonemes CSV, and JSONL file with mel spectrograms "
        "or directory with .npy files (--mels-dir)",
    )
    parser.add_argument(
        "--mels-dir",
        action="store_true",
        help="mels argument is a directory with .npy files",
    )
    parser.add_argument(
        "--config", action="append", help="Path to JSON configuration file(s)"
    )
    parser.add_argument(
        "--batch-size", type=int, help="Batch size (default: use config)"
    )
    parser.add_argument("--checkpoint", help="Path to restore checkpoint")
    parser.add_argument("--git-commit", help="Git commit to store in config")
    parser.add_argument(
        "--checkpoint-epochs",
        type=int,
        default=1,
        help="Number of epochs between checkpoints",
    )
    parser.add_argument(
        "--skip-missing-mels",
        action="store_true",
        help="Only warn about missing mel files",
    )
    parser.add_argument(
        "--no-mesh",
        action="store_true",
        help="Run on a single device without a sharding mesh",
    )
    parser.add_argument(
        "--model-parallel",
        type=int,
        default=1,
        metavar="M",
        help="Tensor parallelism: build a 2-D (data, model) mesh of shape "
        "(n_devices/M, M); weights and Adam moments shard over the model "
        "axis, activations reshard via compiler-inserted collectives "
        "(parallel/partitioning.py).  Default 1 = pure data parallelism",
    )
    parser.add_argument(
        "--no-precompile",
        action="store_true",
        help="Skip the up-front compilation of every expected batch shape "
        "(shapes come from corpus metadata; precompiling avoids mid-epoch "
        "compile pauses and keeps pod hosts in lockstep)",
    )
    parser.add_argument(
        "--mas-impl",
        default="auto",
        choices=("auto", "scan", "pallas"),
        help="Monotonic alignment search implementation (auto: pick the "
        "measured winner per batch shape — see BASELINE.md)",
    )
    parser.add_argument(
        "--profile-dir",
        help="Capture a jax.profiler device trace of training steps 5-15",
    )
    parser.add_argument(
        "--metrics-file",
        help="Append per-epoch metrics as JSON lines to this file",
    )
    parser.add_argument(
        "--coordinator",
        help="Multi-host: coordinator address host:port for "
        "jax.distributed.initialize (also needs --num-processes/--process-id "
        "unless provided by the TPU environment)",
    )
    parser.add_argument("--num-processes", type=int)
    parser.add_argument("--process-id", type=int)
    from .utils.stdio import add_platform_arg

    add_platform_arg(
        parser,
        help_suffix="combine with --virtual-devices to exercise the "
        "multi-chip path without chips",
    )
    parser.add_argument(
        "--virtual-devices",
        type=int,
        help="With --platform cpu: present N virtual devices "
        "(XLA_FLAGS=--xla_force_host_platform_device_count=N); the mesh, "
        "sharding, and collectives run exactly as on an N-chip slice",
    )
    parser.add_argument(
        "--debug", action="store_true", help="Print DEBUG messages to the console"
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.DEBUG if args.debug else logging.INFO)

    from .utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    _LOGGER.debug(args)

    if args.virtual_devices:
        import os

        flags = [
            f
            for f in os.environ.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        ]
        flags.append(
            f"--xla_force_host_platform_device_count={args.virtual_devices}"
        )
        os.environ["XLA_FLAGS"] = " ".join(flags)

    # Heavy imports after arg parsing so --help is fast
    import jax

    from .utils.stdio import apply_platform

    apply_platform(args.platform)

    # Multi-host rendezvous: the GSPMD replacement for the reference's
    # torch.distributed.launch + NCCL process group (__main__.py:83-88).
    # On Cloud TPU pods jax.distributed.initialize() autodetects everything.
    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    from .checkpoint import load_checkpoint
    from .config import TrainingConfig
    from .data import (
        DataPipeline,
        CorpusError,
        MissingMelsError,
        SpeakerSource,
        build_dataset,
        detect_num_symbols,
    )
    from .optimize import make_optimizer
    from .parallel import default_mesh
    from .training import TrainState, initialize_model, train

    args.output = Path(args.output)
    args.dataset = [
        (int(dataset_idx), Path(phonemes_path), Path(mels_path))
        for dataset_idx, phonemes_path, mels_path in args.dataset
    ]
    if args.config:
        args.config = [Path(p) for p in args.config]
    if args.checkpoint:
        args.checkpoint = Path(args.checkpoint)

    config = TrainingConfig()
    if args.config:
        _LOGGER.debug("Loading configuration(s) from %s", args.config)
        config = TrainingConfig.load_and_merge(config, args.config)
    config.git_commit = args.git_commit or ""
    _LOGGER.debug(config)

    args.output.mkdir(parents=True, exist_ok=True)
    random.seed(config.seed)

    num_speakers = config.model.n_speakers
    if num_speakers > 1:
        assert (
            config.model.gin_channels > 0
        ), "Multispeaker model must have gin_channels > 0"
    assert (
        len(args.dataset) <= num_speakers
    ), "More datasets than speakers in model config"
    if len(args.dataset) < num_speakers:
        _LOGGER.warning(
            "Model has %s speaker(s), but only %s dataset(s) were provided",
            num_speakers,
            len(args.dataset),
        )

    # corpus assembly lives in data/corpus.py; the CLI only maps flags
    sources = [
        SpeakerSource(idx, phonemes, mels) for idx, phonemes, mels in args.dataset
    ]
    try:
        dataset = build_dataset(
            sources,
            config,
            mels_are_dirs=args.mels_dir,
            skip_missing_mels=args.skip_missing_mels,
            multispeaker=(num_speakers > 1),
        )
    except MissingMelsError as err:
        _LOGGER.fatal("%s (re-run with --skip-missing-mels to train anyway)", err)
        sys.exit(1)
    except CorpusError as err:  # e.g. mel channel count vs config mismatch
        _LOGGER.fatal("%s", err)
        sys.exit(1)

    # num_symbols auto-detection (fixes reference __main__.py:123 NameError)
    if config.model.num_symbols < 1:
        config.model.num_symbols = detect_num_symbols(dataset)
    assert config.model.num_symbols > 0, "No symbols"

    batch_size = config.batch_size if args.batch_size is None else args.batch_size
    if args.batch_size is not None:
        config.batch_size = args.batch_size

    if args.no_mesh:
        assert args.model_parallel <= 1, "--model-parallel requires a mesh"
        mesh = None
    else:
        mesh = default_mesh(
            config.mesh_axis, model_parallel=args.model_parallel
        )
        n_data = mesh.shape[config.mesh_axis]
        assert batch_size % n_data == 0, (
            f"batch_size {batch_size} must divide evenly over {n_data} "
            f"data-parallel mesh rows"
        )
        _LOGGER.info(
            "Mesh: %s devices, shape %s",
            mesh.devices.size,
            dict(mesh.shape),
        )

    # batch_size is the GLOBAL batch; each host loads its share and the
    # global array is assembled across processes (parallel/mesh.py).  The
    # batch plan (shuffle, buckets, padded shapes) is computed globally and
    # identically on every host (data/dataset.py DataPipeline), so per-step
    # shapes agree across the pod by construction.
    assert batch_size % jax.process_count() == 0, (
        f"batch_size {batch_size} must divide evenly over "
        f"{jax.process_count()} host processes"
    )
    pipeline = DataPipeline(
        dataset,
        config,
        batch_size=batch_size // jax.process_count(),
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
    )

    global_step = 1
    if args.checkpoint:
        _LOGGER.debug("Loading checkpoint from %s", args.checkpoint)
        ckpt = load_checkpoint(args.checkpoint, config)
        import jax.numpy as jnp

        opt_state = ckpt.opt_state
        if opt_state is None:
            tx = make_optimizer(config)
            opt_state = jax.jit(tx.init)(ckpt.params)
        global_step = ckpt.global_step
        state = TrainState(ckpt.params, opt_state, jnp.asarray(global_step, jnp.int32))
        # Continue the data-order sequence: each epoch's shuffle is seeded
        # by (seed + epoch counter), so advancing the counter to the number
        # of completed epochs makes a resumed run consume the exact batch
        # sequence the uninterrupted run would have — restore-and-continue
        # reproduces it bit-for-bit (tests/test_multihost.py).  The
        # reference replays the epoch-1 order on every resume (its
        # sampler.set_epoch is commented out, train.py:101).
        steps_per_epoch = len(pipeline)
        if steps_per_epoch > 0:
            # +1: the original fresh run consumed the epoch-0 draw for its
            # DDI batch, so training epochs shuffle with seeds 1..N
            pipeline.epoch = (global_step - 1) // steps_per_epoch + 1
        _LOGGER.info(
            "Loaded checkpoint from %s (global step=%s, learning rate=%s, "
            "resuming at data epoch %s)",
            args.checkpoint,
            global_step,
            ckpt.learning_rate,
            pipeline.epoch + 1,
        )
    else:
        _LOGGER.info("Doing data-dependent initialization...")
        import jax.numpy as jnp

        first_batch = next(iter(pipeline.batches()))
        params = initialize_model(config, first_batch, mesh=mesh)
        tx = make_optimizer(config)
        opt_state = jax.jit(tx.init)(params)
        state = TrainState(params, opt_state, jnp.asarray(1, jnp.int32))

    _LOGGER.info("Training started (batch size=%s)", batch_size)
    try:
        train(
            pipeline.batches,
            config,
            args.output,
            state,
            checkpoint_epochs=args.checkpoint_epochs,
            mesh=mesh,
            mas_impl=args.mas_impl,
            profile_dir=Path(args.profile_dir) if args.profile_dir else None,
            metrics_path=None if not args.metrics_file else Path(args.metrics_file),
            # compile every expected step shape before the loop (and before
            # the prefetch thread starts) — shapes derive from corpus
            # metadata alone, no mel loads
            precompile_shapes=(
                pipeline.epoch_shapes() if not args.no_precompile else None
            ),
        )
        _LOGGER.info("Training finished")
    except KeyboardInterrupt:
        _LOGGER.info("Training stopped")


if __name__ == "__main__":
    main()
