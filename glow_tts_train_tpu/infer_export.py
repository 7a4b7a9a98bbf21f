#!/usr/bin/env python3
"""Run an exported artifact: StableHLO, SavedModel, or true .onnx.

Contract parity with reference `infer_onnx.py:20-162`: same stdin/stdout
JSONL interface as the torch infer CLI, default ``--noise-scale`` 0.667
(infer_onnx.py:36), runs the serialized graph instead of live model code.
Also fixes the reference bug where JSONL output reads nonexistent
AudioConfig fields (infer_onnx.py:84-90 — crashes as shipped)."""

import argparse
import json
import logging
import time
from pathlib import Path

_LOGGER = logging.getLogger("glow_tts_train_tpu.infer_export")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="glow-tts-infer-export-tpu")
    parser.add_argument("model_dir", help="Directory with exported model")
    parser.add_argument("--numpy-dir", help="Output .npy files instead of JSONL")
    parser.add_argument(
        "--csv", action="store_true", help="Input format is id|p1 p2 p3..."
    )
    parser.add_argument("--noise-scale", type=float, default=0.667)
    parser.add_argument("--length-scale", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=1234)
    from .utils.stdio import add_platform_arg

    add_platform_arg(
        parser, help_suffix="artifacts are exported multi-platform"
    )
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.DEBUG if args.debug else logging.INFO)

    from .utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    run(
        args.model_dir,
        numpy_dir=args.numpy_dir,
        csv=args.csv,
        noise_scale=args.noise_scale,
        length_scale=args.length_scale,
        seed=args.seed,
        platform=args.platform,
    )


def run(
    model_dir,
    *,
    numpy_dir=None,
    csv: bool = False,
    noise_scale: float = 0.667,
    length_scale: float = 1.0,
    seed: int = 1234,
    platform: str = "auto",
) -> None:
    """Stream stdin utterances through an exported artifact (library entry —
    the torch-infer CLI delegates here for export-directory inputs).

    Artifact type is detected from the path: a StableHLO
    ``generator.stablehlo`` runs via jax.export; a TensorFlow SavedModel
    (``saved_model.pb``) runs under stock TF — no JAX involved; a
    ``generator.onnx`` (or a direct path to any ``.onnx`` file — the
    reference CLI contract, infer_onnx.py:24) runs under onnxruntime where
    installed and the built-in numpy executor (onnx/runtime.py) elsewhere."""
    import numpy as np

    from .config import TrainingConfig
    from .export import ARTIFACT_NAME, META_NAME, ONNX_NAME

    model_dir = Path(model_dir)
    onnx_file = None
    if model_dir.is_file():
        if model_dir.suffix != ".onnx":
            raise SystemExit(
                f"{model_dir} is a file but not .onnx; pass an export "
                "directory or a .onnx path"
            )
        onnx_file = model_dir
        model_dir = model_dir.parent
    elif (
        (model_dir / ONNX_NAME).exists()
        and not (model_dir / ARTIFACT_NAME).exists()
        and not (model_dir / "saved_model.pb").exists()
    ):
        onnx_file = model_dir / ONNX_NAME

    if (model_dir / "config.json").exists():
        with open(model_dir / "config.json") as config_file:
            config = TrainingConfig.load(config_file)
    elif onnx_file is not None:
        # an externally-produced .onnx may arrive bare; audio metadata
        # falls back to defaults (the reference requires --config for the
        # same reason, infer_onnx.py:60-64)
        _LOGGER.warning("no config.json next to %s; using defaults", onnx_file)
        config = TrainingConfig()
    else:
        raise SystemExit(f"missing {model_dir / 'config.json'}")
    max_text_length = None
    if (model_dir / META_NAME).exists():
        with open(model_dir / META_NAME) as meta_file:
            meta = json.load(meta_file)
        max_text_length = int(meta["max_text_length"])

    start_time = time.perf_counter()
    if onnx_file is not None:
        try:
            import onnxruntime

            sess = onnxruntime.InferenceSession(str(onnx_file))
            backend = "onnxruntime"
        except ImportError:
            from .onnx import OnnxRuntime

            sess = OnnxRuntime.from_file(onnx_file, seed=seed)
            backend = "glow_tts_train_tpu.onnx.runtime (numpy)"
        _LOGGER.debug("ONNX backend: %s", backend)

        def call_fn(text, text_lengths, scales, seed):
            del seed  # noise rides the graph's RandomNormalLike node
            out = sess.run(
                None,
                {
                    "input": np.asarray(text, np.int64),
                    "input_lengths": np.asarray(text_lengths, np.int64),
                    "scales": np.asarray(scales, np.float32),
                },
            )
            return np.asarray(out[0]), np.asarray(out[1])

    elif (model_dir / ARTIFACT_NAME).exists():
        import jax

        from .utils.stdio import apply_platform

        apply_platform(platform)
        from jax import export as jax_export

        exported = jax_export.deserialize(
            bytearray((model_dir / ARTIFACT_NAME).read_bytes())
        )
        call_fn = exported.call
    elif (model_dir / "saved_model.pb").exists():
        import tensorflow as tf

        loaded = tf.saved_model.load(str(model_dir))
        tf_fn = getattr(loaded, "infer", None) or loaded.signatures[
            "serving_default"
        ]

        def call_fn(text, text_lengths, scales, seed):
            out = tf_fn(
                tf.constant(text),
                tf.constant(text_lengths),
                tf.constant(scales),
                tf.constant(seed),
            )
            if isinstance(out, dict):
                # a signature ConcreteFunction returns named outputs; pick
                # by rank (mel [1, n_mel, t] vs lengths [1])
                vals = [np.asarray(v) for _, v in sorted(out.items())]
                mel = next(v for v in vals if v.ndim == 3)
                mel_lengths = next(v for v in vals if v.ndim == 1)
            else:
                mel, mel_lengths = out
            return np.asarray(mel), np.asarray(mel_lengths)

    else:
        raise SystemExit(
            f"no runnable artifact in {model_dir}: expected {ARTIFACT_NAME} "
            "(StableHLO) or saved_model.pb (TensorFlow SavedModel)"
        )
    _LOGGER.info(
        "Loaded exported model from %s in %s second(s)",
        model_dir,
        time.perf_counter() - start_time,
    )

    scales = np.asarray([noise_scale, length_scale], np.float32)
    seed_arr = np.asarray(seed, np.int32)

    from .utils.stdio import exit_if_skipped, make_emitter, stdin_utterances

    emit = make_emitter(numpy_dir, config.audio)
    skipped: list = []
    try:
        for utt_id, phoneme_ids in stdin_utterances(
            csv, config.model.num_symbols, skipped=skipped
        ):
            if onnx_file is not None:
                # ONNX graphs have dynamic axes: exact shapes, no padding
                text = np.asarray(phoneme_ids, np.int64)[None, :]
                text_lengths = np.asarray([len(phoneme_ids)], np.int64)
            else:
                if max_text_length is None:
                    raise SystemExit(f"missing {model_dir / META_NAME}")
                if len(phoneme_ids) > max_text_length:
                    _LOGGER.warning(
                        "Utterance %s longer than export budget (%s > %s); truncating",
                        utt_id,
                        len(phoneme_ids),
                        max_text_length,
                    )
                    phoneme_ids = phoneme_ids[:max_text_length]

                text = np.zeros((1, max_text_length), np.int32)
                text[0, : len(phoneme_ids)] = phoneme_ids
                text_lengths = np.asarray([len(phoneme_ids)], np.int32)

            start_time = time.perf_counter()
            mel, mel_lengths = call_fn(text, text_lengths, scales, seed_arr)
            elapsed = time.perf_counter() - start_time

            mel = np.asarray(mel)[0, :, : int(np.asarray(mel_lengths)[0])]
            emit(utt_id, mel)
            _LOGGER.debug(
                "Generated mel in %s second(s) (%s, shape=%s)",
                elapsed,
                utt_id,
                list(mel.shape),
            )
    except KeyboardInterrupt:
        pass
    exit_if_skipped(skipped)


if __name__ == "__main__":
    main()
