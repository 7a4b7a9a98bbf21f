"""Config schema parity and overlay-merge tests (reference config.py:92-124)."""

import io
import json

from glow_tts_train_tpu.config import AudioConfig, ModelConfig, TrainingConfig


def test_defaults_match_reference_schema():
    c = TrainingConfig()
    # spot-check reference defaults (config.py:11-81)
    assert c.audio.filter_length == 1024
    assert c.audio.hop_length == 256
    assert c.audio.mel_channels == 80
    assert c.audio.sample_rate == 22050
    assert c.audio.mel_fmax == 8000.0
    assert c.model.hidden_channels == 192
    assert c.model.filter_channels == 768
    assert c.model.filter_channels_dp == 256
    assert c.model.n_blocks_dec == 12
    assert c.model.n_layers_enc == 6
    assert c.model.n_heads == 2
    assert c.model.dilation_rate == 1
    assert c.model.n_sqz == 2
    assert c.model.prenet is True
    assert c.model.mean_only is True
    assert c.model.window_size == 4
    assert c.model.n_split == 4
    assert c.learning_rate == 1.0
    assert c.betas == (0.9, 0.98)
    assert c.eps == 1e-9
    assert c.grad_clip == 5.0
    assert c.warmup_steps == 4000
    assert c.scheduler == "noam"
    assert c.batch_size == 32
    assert c.seed == 1234


def test_save_load_roundtrip():
    c = TrainingConfig()
    c.model.num_symbols = 123
    c.audio.mel_fmax = None
    buf = io.StringIO()
    c.save(buf)
    buf.seek(0)
    c2 = TrainingConfig.load(buf)
    assert c2.model.num_symbols == 123
    assert c2.audio.mel_fmax is None
    assert c2.to_dict() == c.to_dict()


def test_load_and_merge_overlay():
    base = TrainingConfig()
    overlay1 = io.StringIO(
        json.dumps({"model": {"num_symbols": 100}, "batch_size": 16})
    )
    overlay2 = io.StringIO(json.dumps({"model": {"hidden_channels": 64}}))
    merged = TrainingConfig.load_and_merge(base, [overlay1, overlay2])
    # later overlays win, earlier values survive, untouched defaults remain
    assert merged.model.num_symbols == 100
    assert merged.model.hidden_channels == 64
    assert merged.batch_size == 16
    assert merged.model.filter_channels == 768
    assert merged.audio.sample_rate == 22050


def test_unknown_keys_tolerated():
    merged = TrainingConfig.load_and_merge(
        TrainingConfig(), [io.StringIO(json.dumps({"model": {"not_a_field": 1}}))]
    )
    assert merged.model.hidden_channels == 192


def test_reference_config_json_loads():
    """A config JSON in the reference's published format must parse."""
    ref_style = {
        "seed": 4444,
        "batch_size": 16,
        "fp16_run": True,
        "audio": {"mel_channels": 80, "sample_rate": 22050},
        "model": {"num_symbols": 130, "n_speakers": 1},
        "betas": [0.9, 0.98],
    }
    c = TrainingConfig.load_and_merge(
        TrainingConfig(), [io.StringIO(json.dumps(ref_style))]
    )
    assert c.seed == 4444
    assert c.fp16_run is True
    assert c.betas == (0.9, 0.98)
    assert c.model.num_symbols == 130
