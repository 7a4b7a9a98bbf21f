#!/usr/bin/env python3
"""Export CLI: serialize an inference-only graph to a portable artifact.

Capability parity with reference `export.py` (TorchScript) and
`export_onnx.py` (ONNX opset 12), with three formats:

* ``--format stablehlo`` (default) — serialized StableHLO via ``jax.export``
  with parameters embedded as constants: the TPU-native "weights baked into
  a portable graph" artifact, multi-platform (tpu + cpu).  Note the
  reference's TorchScript export is broken as shipped (rebinds a
  nonexistent ``model.infer``, export.py:73); this is the working
  equivalent.
* ``--format savedmodel`` — a TensorFlow SavedModel via ``jax2tf``: the
  graph leaves JAX entirely and runs under stock TensorFlow, and is the
  direct input to ``tf2onnx`` where that toolchain exists.
* ``--format onnx`` — a true ``generator.onnx`` (reference
  export_onnx.py:105-118) built natively by the first-party exporter
  (onnx/export.py: the generation graph hand-lowered to opset-12 ONNX on
  our own protobuf wire codec — no torch, no tf2onnx, no onnx package).
  Unlike the reference's traced export it has fully dynamic batch/phoneme/
  time axes.  Runs under onnxruntime where installed, and under the
  framework's own numpy executor (onnx/runtime.py) everywhere else.

Every exported callable mirrors the ONNX signature (export_onnx.py:73-86):

    (input [1, T] int32, input_lengths [1] int32,
     scales [2] f32 = [noise, length], seed [] int32)
        -> (mel [1, n_mel, y_max] f32, mel_lengths [1] int32)

Shapes are static (XLA): text padded to ``--max-text-length``, frames
generated into ``--max-frames``.  A ``config.json`` is written next to the
artifact (export_onnx.py:92-93).
"""

import argparse
import json
import logging
from pathlib import Path

_LOGGER = logging.getLogger("glow_tts_train_tpu.export")

ARTIFACT_NAME = "generator.stablehlo"
ONNX_NAME = "generator.onnx"
META_NAME = "export_meta.json"

FORMATS = ("stablehlo", "savedmodel", "onnx", "torch")
TORCH_NAME = "generator.pth"


def build_infer_fn(params, config, max_frames: int, speaker: int = 0):
    """The inference graph with params closed over (exported as constants).

    Multispeaker models bake the given ``speaker`` id into the artifact
    (the exported signature has no speaker input — reference
    export_onnx.py:73-86 — so one artifact per voice)."""
    import jax
    import jax.numpy as jnp

    from .models import forward_gen, hyper_from_config

    hp = hyper_from_config(config)
    # exported artifacts must be multi-platform (tpu + cpu): force the
    # op-by-op XLA path — Pallas/Mosaic custom calls resolved from a TPU
    # host would not lower for the artifact's cpu variant.  Same numerics
    # (the kernels are parity-tested against this path).
    hp = hp._replace(
        wn_impl="xla", block_fuse=False, block_fuse_reverse=False,
        encoder_fuse=False, wn_residuals="recompute", unroll=False,
    )
    g_ids = (
        jnp.full((1,), speaker, jnp.int32)
        if config.model.n_speakers > 1
        else None
    )

    def infer_fn(text, text_lengths, scales, seed):
        noise_scale = scales[0]
        length_scale = scales[1]
        out = forward_gen(
            params,
            hp,
            text,
            text_lengths,
            y_max_length=max_frames,
            noise_rng=jax.random.PRNGKey(seed),
            noise_scale=noise_scale,
            length_scale=length_scale,
            g_ids=g_ids,
        )
        (y, _, _, _), _, _, y_lengths = out
        # [1, t, n_mel] -> [1, n_mel, t] (ONNX output layout)
        return y.transpose(0, 2, 1), y_lengths

    return infer_fn


def export_model(
    params, config, max_text_length: int, max_frames: int, speaker: int = 0
) -> bytes:
    """Build + serialize the StableHLO inference graph."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    infer_fn = build_infer_fn(params, config, max_frames, speaker=speaker)
    args_spec = (
        jax.ShapeDtypeStruct((1, max_text_length), jnp.int32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((2,), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    # multi-platform artifact: runs on TPU or CPU hosts (lowered once per
    # platform, like an ONNX file running on any EP)
    exported = jax_export.export(jax.jit(infer_fn), platforms=("tpu", "cpu"))(
        *args_spec
    )
    return exported.serialize()


def _tf_function(
    params, config, max_text_length: int, max_frames: int, speaker: int = 0
):
    """The inference graph as a tf.function (shared by savedmodel + onnx)."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    infer_fn = build_infer_fn(params, config, max_frames, speaker=speaker)
    return tf.function(
        jax2tf.convert(infer_fn, with_gradient=False),
        input_signature=[
            tf.TensorSpec((1, max_text_length), tf.int32, name="input"),
            tf.TensorSpec((1,), tf.int32, name="input_lengths"),
            tf.TensorSpec((2,), tf.float32, name="scales"),
            tf.TensorSpec((), tf.int32, name="seed"),
        ],
        autograph=False,
    )


def export_savedmodel(
    params, config, max_text_length: int, max_frames: int, output_dir: Path,
    speaker: int = 0,
) -> None:
    """Write a TensorFlow SavedModel — the graph fully out of JAX."""
    import tensorflow as tf

    module = tf.Module()
    module.infer = _tf_function(
        params, config, max_text_length, max_frames, speaker=speaker
    )
    tf.saved_model.save(
        module,
        str(output_dir),
        signatures={"serving_default": module.infer.get_concrete_function()},
    )


def export_onnx(
    params, config, max_text_length: int, max_frames: int, output_dir: Path,
    speaker: int = 0,
) -> None:
    """Write a true opset-12 .onnx via the native exporter (onnx/export.py).

    The graph carries dynamic batch/phoneme/time axes, so the static
    ``max_text_length``/``max_frames`` budgets do not apply (accepted for
    CLI signature uniformity; recorded in the meta as advisory only)."""
    del max_text_length, max_frames  # ONNX graphs are fully dynamic
    from .onnx.export import export_generator_onnx

    blob = export_generator_onnx(params, config, speaker=speaker)
    (output_dir / ONNX_NAME).write_bytes(blob)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="glow-tts-export-tpu")
    parser.add_argument("checkpoint", help="Path to model checkpoint (.npz or .pth)")
    parser.add_argument("output", help="Directory to write exported model")
    parser.add_argument(
        "--config", action="append", help="Path to JSON configuration file(s)"
    )
    parser.add_argument("--num-symbols", type=int)
    parser.add_argument(
        "--format",
        default="stablehlo",
        choices=FORMATS,
        help="Artifact format (stablehlo: jax.export, tpu+cpu; savedmodel: "
        "TensorFlow SavedModel via jax2tf; onnx: true opset-12 .onnx via "
        "the native exporter — dynamic axes, runs under onnxruntime or "
        "the built-in numpy executor)",
    )
    parser.add_argument(
        "--max-text-length", type=int, default=256, help="Static phoneme budget"
    )
    parser.add_argument(
        "--max-frames", type=int, default=2048, help="Static mel frame budget"
    )
    parser.add_argument(
        "--speaker",
        type=int,
        help="Multispeaker models: speaker id to bake into the artifact "
        "(the exported signature has no speaker input; default 0)",
    )
    from .utils.stdio import add_platform_arg

    add_platform_arg(
        parser, help_suffix="artifacts are exported multi-platform regardless"
    )
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.DEBUG if args.debug else logging.INFO)

    from .utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from .utils.stdio import apply_platform

    apply_platform(args.platform)

    from .checkpoint import load_checkpoint
    from .config import TrainingConfig
    from .models import store_inverse

    if args.config:
        args.config = [Path(p) for p in args.config]
    args.checkpoint = Path(args.checkpoint)
    args.output = Path(args.output)

    config = TrainingConfig()
    if args.config:
        config = TrainingConfig.load_and_merge(config, args.config)
    if args.num_symbols is not None:
        config.model.num_symbols = args.num_symbols
    assert config.model.num_symbols > 0, "Number of symbols not set"

    from .utils.stdio import validate_speaker

    n_speakers = config.model.n_speakers
    speaker = validate_speaker(parser, n_speakers, args.speaker)

    # torch export carries the Adam moments through to the .pth (resume-safe
    # reverse migration); graph exports only need the weights
    checkpoint = load_checkpoint(
        args.checkpoint, config, load_optimizer=(args.format == "torch")
    )
    _LOGGER.info(
        "Loaded checkpoint from %s (global step=%s)",
        args.checkpoint,
        checkpoint.global_step,
    )

    args.output.mkdir(parents=True, exist_ok=True)

    if args.format == "torch":
        # reverse migration: a reference-compatible .pth the PyTorch stack
        # loads with strict=True (exact inverse of the .pth importer) —
        # raw training weights, NOT store_inverse'd (the reference calls
        # store_inverse itself at inference, models.py:408-409)
        from .checkpoint import save_torch_checkpoint

        save_torch_checkpoint(checkpoint, config, args.output / TORCH_NAME)
        with open(args.output / "config.json", "w") as config_file:
            config.save(config_file)
        _LOGGER.info("Exported model (torch) to %s", args.output)
        return

    params = store_inverse(checkpoint.params)

    if args.format == "stablehlo":
        serialized = export_model(
            params, config, args.max_text_length, args.max_frames,
            speaker=speaker,
        )
        (args.output / ARTIFACT_NAME).write_bytes(serialized)
    elif args.format == "savedmodel":
        export_savedmodel(
            params, config, args.max_text_length, args.max_frames, args.output,
            speaker=speaker,
        )
    else:
        export_onnx(
            params, config, args.max_text_length, args.max_frames, args.output,
            speaker=speaker,
        )

    with open(args.output / "config.json", "w") as config_file:
        config.save(config_file)
    with open(args.output / META_NAME, "w") as meta_file:
        json.dump(
            {
                "format": args.format,
                "max_text_length": args.max_text_length,
                "max_frames": args.max_frames,
                "global_step": checkpoint.global_step,
                "speaker": speaker if n_speakers > 1 else None,
            },
            meta_file,
            indent=2,
        )
    _LOGGER.info("Exported model (%s) to %s", args.format, args.output)


if __name__ == "__main__":
    main()
