"""Shared test fixtures: a tiny Glow-TTS config and random batches."""

import numpy as np

from glow_tts_train_tpu.config import AudioConfig, ModelConfig, TrainingConfig


def tiny_config(**model_overrides) -> TrainingConfig:
    model = ModelConfig(
        num_symbols=20,
        hidden_channels=16,
        filter_channels=32,
        filter_channels_dp=16,
        kernel_size=3,
        p_dropout=0.1,
        n_blocks_dec=2,
        n_layers_enc=2,
        n_heads=2,
        p_dropout_dec=0.05,
        dilation_rate=1,
        kernel_size_dec=5,
        n_block_layers=2,
        n_sqz=2,
        prenet=True,
        mean_only=True,
        hidden_channels_enc=16,
        hidden_channels_dec=16,
        window_size=4,
        n_speakers=1,
        n_split=4,
    )
    for k, v in model_overrides.items():
        setattr(model, k, v)
    audio = AudioConfig(mel_channels=8)
    return TrainingConfig(
        model=model,
        audio=audio,
        batch_size=4,
        bucket_size_text=1,
        bucket_size_mel=1,
    )


def random_batch(config, rng, b=4, t_x=11, t_y=26, multispeaker=False):
    x = rng.integers(1, config.model.num_symbols, size=(b, t_x)).astype(np.int32)
    x_lengths = rng.integers(max(2, t_x - 4), t_x + 1, size=b).astype(np.int32)
    x_lengths[0] = t_x
    for i in range(b):
        x[i, x_lengths[i]:] = 0
    y_lengths = rng.integers(max(4, t_y - 9), t_y + 1, size=b).astype(np.int32)
    y_lengths[0] = t_y
    y_lengths = np.maximum(y_lengths, 2 * x_lengths)  # need t_y >= t_x after n_sqz
    t_y = int(y_lengths.max())
    y = rng.standard_normal((b, t_y, config.audio.mel_channels)).astype(np.float32)
    for i in range(b):
        y[i, y_lengths[i]:] = 0.0
    batch = {
        "x": x,
        "x_lengths": x_lengths,
        "y": y,
        "y_lengths": y_lengths,
    }
    if multispeaker:
        batch["speaker_ids"] = rng.integers(
            0, config.model.n_speakers, size=b
        ).astype(np.int32)
    return batch
