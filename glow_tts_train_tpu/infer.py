#!/usr/bin/env python3
"""Inference CLI: phoneme ids on stdin → mel spectrograms on stdout.

Contract parity with reference `infer.py:20-209`:
* stdin: whitespace-separated phoneme ids, one utterance per line; with
  ``--csv`` the format is ``id|p1 p2 …``
* stdout: JSONL ``{"id": ..., "audio": {<AudioConfig>}, "mel": [[...]]}``
  with mel as [n_mel, t] — or ``.npy`` files under ``--numpy-dir``
* ``--noise-scale`` default 0.333, ``--length-scale`` 1.0, ``--speaker``

TPU redesign: XLA needs static shapes, so inputs are padded to text-length
buckets and frames are generated into a bucketed budget predicted by an
encoder-only pre-pass; each (text_bucket, frame_bucket) pair compiles once
and is cached.  Unlike the reference (one utterance at a time, infer.py:154
TODO), ``--batch-size`` synthesizes multiple stdin lines per device pass.
"""

import argparse
import logging
import sys
import time
from functools import partial
from pathlib import Path

_LOGGER = logging.getLogger("glow_tts_train_tpu.infer")


def build_synthesizer(
    params, config, noise_scale: float, length_scale: float, mas_free: bool = True
):
    """Returns synth(batch_ids: List[List[int]], speaker: Optional[int])
    -> List[np.ndarray [n_mel, t]]. Compiles per shape bucket, caches."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .models import forward_gen, hyper_from_config
    from .models.glow_tts import encoder_forward, _speaker_vector

    hp = hyper_from_config(config)
    bucket_t = max(config.bucket_size_text, 1)
    bucket_y = max(config.bucket_size_mel, 1)
    # upload weights once — numpy params as jit args would be re-transferred
    # host->device on every call
    params = jax.device_put(
        jax.tree_util.tree_map(jnp.asarray, params)
    )

    @partial(jax.jit, static_argnames=("length_scale_static",))
    def predict_frames(params, x, x_lengths, g_ids, length_scale_static):
        """Frame budget AND the encoder outputs — handed to gen() so the
        encoder runs once per synthesis, not twice."""
        g = _speaker_vector(params, g_ids)
        enc = encoder_forward(params, hp, x, x_lengths, g=g)
        _, _, logw, x_mask = enc
        w = jnp.exp(logw.astype(jnp.float32)) * x_mask * length_scale_static
        return jnp.sum(jnp.ceil(w), axis=(1, 2)).astype(jnp.int32), enc

    @partial(jax.jit, static_argnames=("y_max_length",))
    def gen(params, x, x_lengths, g_ids, noise_rng, y_max_length, enc):
        out = forward_gen(
            params,
            hp,
            x,
            x_lengths,
            y_max_length=y_max_length,
            noise_rng=noise_rng,
            noise_scale=noise_scale,
            length_scale=length_scale,
            g_ids=g_ids,
            encoder_out=enc,
        )
        (y, _, _, _), _, _, y_lengths = out
        return y, y_lengths

    rng_holder = {"rng": jax.random.PRNGKey(config.seed)}

    def synth(batch_ids, speaker=None):
        import numpy as np

        b = len(batch_ids)
        t_max = max(len(ids) for ids in batch_ids)
        t_pad = ((t_max + bucket_t - 1) // bucket_t) * bucket_t
        x = np.zeros((b, t_pad), np.int32)
        x_lengths = np.zeros((b,), np.int32)
        for i, ids in enumerate(batch_ids):
            x[i, : len(ids)] = ids
            x_lengths[i] = len(ids)
        g_ids = None
        if speaker is not None:
            g_ids = jnp.full((b,), speaker, jnp.int32)

        frames, enc = predict_frames(
            params, jnp.asarray(x), jnp.asarray(x_lengths), g_ids, length_scale
        )
        budget = int(np.max(np.asarray(frames))) + hp.n_sqz
        y_max = ((budget + bucket_y - 1) // bucket_y) * bucket_y

        rng_holder["rng"], noise_rng = jax.random.split(rng_holder["rng"])
        y, y_lengths = gen(
            params, jnp.asarray(x), jnp.asarray(x_lengths), g_ids, noise_rng,
            y_max, enc,
        )
        y = np.asarray(y, np.float32)
        y_lengths = np.asarray(y_lengths)
        # [b, t, n_mel] -> per-utterance [n_mel, t] (reference output layout)
        return [y[i, : y_lengths[i]].T for i in range(b)]

    return synth


def main():
    parser = argparse.ArgumentParser(prog="glow-tts-infer-tpu")
    parser.add_argument("checkpoint", help="Path to model checkpoint (.npz or .pth)")
    parser.add_argument(
        "--numpy-dir", help="Output numpy files to a directory instead of JSONL"
    )
    parser.add_argument(
        "--config", action="append", help="Path to JSON configuration file(s)"
    )
    parser.add_argument(
        "--num-symbols", type=int, help="Number of symbols in the model"
    )
    parser.add_argument(
        "--csv", action="store_true", help="Input format is id|p1 p2 p3..."
    )
    parser.add_argument("--noise-scale", type=float, default=0.333)
    parser.add_argument("--length-scale", type=float, default=1.0)
    parser.add_argument(
        "--batch-size", type=int, default=1, help="Utterances per device pass"
    )
    parser.add_argument(
        "--speaker", type=int, help="Speaker id number (multispeaker model only)"
    )
    from .utils.stdio import add_platform_arg

    add_platform_arg(parser)
    parser.add_argument(
        "--debug", action="store_true", help="Print DEBUG messages to the console"
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.DEBUG if args.debug else logging.INFO)

    from .utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    _LOGGER.debug(args)

    from .utils.stdio import apply_platform

    apply_platform(args.platform)

    import numpy as np

    from .checkpoint import load_checkpoint
    from .config import TrainingConfig
    from .models import store_inverse

    if args.config:
        args.config = [Path(p) for p in args.config]
    args.checkpoint = Path(args.checkpoint)

    # Export-directory input: run the serialized artifact instead (the
    # reference's --jit TorchScript path, infer.py:88-100)
    from .export import ARTIFACT_NAME

    if args.checkpoint.is_dir() and (args.checkpoint / ARTIFACT_NAME).exists():
        from . import infer_export

        # exported graphs bake in the speaker/config and synthesize one
        # utterance per call — reject options the artifact cannot honor
        if args.speaker is not None:
            parser.error(
                "--speaker is baked into exported artifacts; re-export with "
                "the desired speaker or run from a checkpoint"
            )
        if args.batch_size != 1:
            _LOGGER.warning(
                "--batch-size is ignored for exported artifacts "
                "(one utterance per call)"
            )
        return infer_export.run(
            args.checkpoint,
            numpy_dir=args.numpy_dir,
            csv=args.csv,
            noise_scale=args.noise_scale,
            length_scale=args.length_scale,
        )
    config = TrainingConfig()
    if args.config:
        _LOGGER.debug("Loading configuration(s) from %s", args.config)
        config = TrainingConfig.load_and_merge(config, args.config)
    if args.num_symbols is not None:
        config.model.num_symbols = args.num_symbols
    assert (
        config.model.num_symbols > 0
    ), "Number of symbols not set (did you forget --config or --num-symbols?)"

    from .utils.stdio import validate_speaker

    if args.speaker is not None:
        validate_speaker(parser, config.model.n_speakers, args.speaker)

    start_time = time.perf_counter()
    checkpoint = load_checkpoint(args.checkpoint, config, load_optimizer=False)
    params = store_inverse(checkpoint.params)
    _LOGGER.info(
        "Loaded checkpoint from %s in %s second(s) (global step=%s)",
        args.checkpoint,
        time.perf_counter() - start_time,
        checkpoint.global_step,
    )

    speaker = args.speaker
    if speaker is None and config.model.n_speakers > 1:
        speaker = 0

    synth = build_synthesizer(
        params, config, noise_scale=args.noise_scale, length_scale=args.length_scale
    )

    from .utils.stdio import exit_if_skipped, make_emitter, stdin_utterances

    emit = make_emitter(args.numpy_dir, config.audio)
    pending = []  # (utt_id, phoneme_ids)
    skipped: list = []
    try:
        for utt_id, phoneme_ids in stdin_utterances(
            args.csv, config.model.num_symbols, skipped=skipped
        ):
            _LOGGER.debug("%s (id=%s)", phoneme_ids, utt_id)
            pending.append((utt_id, phoneme_ids))
            if len(pending) >= args.batch_size:
                flush(pending, synth, speaker, emit)
                pending = []
        if pending:
            flush(pending, synth, speaker, emit)
    except KeyboardInterrupt:
        pass
    exit_if_skipped(skipped)


def flush(pending, synth, speaker, emit):
    start_time = time.perf_counter()
    mels = synth([ids for _, ids in pending], speaker=speaker)
    elapsed = time.perf_counter() - start_time
    for (utt_id, _), mel in zip(pending, mels):
        emit(utt_id, mel)
        _LOGGER.debug(
            "Generated mel in %s second(s) (%s, shape=%s)",
            elapsed,
            utt_id,
            list(mel.shape),
        )


if __name__ == "__main__":
    main()
