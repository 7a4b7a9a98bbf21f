"""Unit tests for the shared CLI plumbing (utils/stdio.py) and the
compilation-cache helper (utils/jaxcache.py)."""

import io
import json
import sys

import numpy as np
import pytest

from glow_tts_train_tpu.config import AudioConfig
from glow_tts_train_tpu.utils.stdio import (
    make_emitter,
    stdin_utterances,
    validate_speaker,
)


def _with_stdin(monkeypatch, text):
    monkeypatch.setattr(sys, "stdin", io.StringIO(text))


def test_stdin_utterances_plain_and_csv(monkeypatch):
    _with_stdin(monkeypatch, "3 7 12\n\n4 8\n")
    assert list(stdin_utterances(False, 20)) == [
        ("", [3, 7, 12]),
        ("", [4, 8]),
    ]
    # csv mode: only the FIRST pipe splits (ids may not contain pipes, but
    # the contract is maxsplit=1 like the reference)
    _with_stdin(monkeypatch, "utt1|3 7\n")
    assert list(stdin_utterances(True, 20)) == [("utt1", [3, 7])]


def test_stdin_utterances_rejects_out_of_range(monkeypatch, caplog):
    _with_stdin(monkeypatch, "3 99\n-1 4\n5 6\n")
    skipped: list = []
    out = list(stdin_utterances(False, 20, skipped=skipped))
    assert out == [("", [5, 6])]
    assert sum("out of range" in r.message for r in caplog.records) == 2
    # rejected lines are recorded so CLIs can exit non-zero: JSONL output
    # is no longer 1:1 with input lines, positional consumers must notice
    assert len(skipped) == 2
    from glow_tts_train_tpu.utils.stdio import exit_if_skipped

    with pytest.raises(SystemExit) as excinfo:
        exit_if_skipped(skipped)
    assert excinfo.value.code == 1
    exit_if_skipped([])  # no skips -> no exit


def test_dropout_rate_one_and_clamp():
    """rate>=1.0 must drop everything (the uint32 threshold would wrap to 0
    and KEEP everything scaled by inf on NumPy 1.x / raise on 2.x)."""
    import jax
    import jax.numpy as jnp

    from glow_tts_train_tpu.ops.attention import dropout

    x = jnp.ones((4, 8))
    out = dropout(jax.random.PRNGKey(0), x, 1.0, deterministic=False)
    assert np.all(np.asarray(out) == 0.0)
    # just-below-1 rounds to 2**32 pre-clamp; must still run and drop ~all
    out = dropout(jax.random.PRNGKey(0), x, 1.0 - 2e-10, deterministic=False)
    assert np.all(np.isfinite(np.asarray(out)))


def test_make_emitter_jsonl(capsys):
    emit = make_emitter(None, AudioConfig(mel_channels=8))
    emit("u1", np.zeros((8, 3), np.float32))
    obj = json.loads(capsys.readouterr().out.strip())
    assert obj["id"] == "u1"
    assert obj["audio"]["mel_channels"] == 8
    assert np.asarray(obj["mel"]).shape == (8, 3)


def test_make_emitter_numpy_dir(tmp_path):
    emit = make_emitter(tmp_path / "out", AudioConfig())
    emit("u2", np.ones((4, 5), np.float32))
    emit("", np.ones((4, 2), np.float32))  # no id -> timestamp filename
    files = list((tmp_path / "out").glob("*.npy"))
    assert len(files) == 2
    assert (tmp_path / "out" / "u2.npy").exists()


def test_validate_speaker():
    class FakeParser:
        def error(self, msg):
            raise SystemExit(msg)

    p = FakeParser()
    assert validate_speaker(p, 1, None) == 0
    assert validate_speaker(p, 3, 2) == 2
    assert validate_speaker(p, 3, None) == 0
    with pytest.raises(SystemExit, match="multispeaker"):
        validate_speaker(p, 1, 0)
    with pytest.raises(SystemExit, match="out of range"):
        validate_speaker(p, 3, 5)


def test_jaxcache_honors_env(monkeypatch, tmp_path):
    import jax

    from glow_tts_train_tpu.utils.jaxcache import enable_compilation_cache

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    cache_dir = tmp_path / "cache"
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(cache_dir))
    try:
        enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == str(cache_dir)
        assert cache_dir.is_dir()
    finally:  # process-global config: do not leak into later tests
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min
        )
