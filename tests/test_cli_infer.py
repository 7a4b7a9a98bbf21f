"""The inference CLI's stdin/stdout contract through the REAL entry point
(reference infer.py:139-194): whitespace phoneme ids in, JSONL
{"id", "audio", "mel"} out; --csv id-prefixed input; --numpy-dir .npy
output; --batch-size batching.  Runs in fresh subprocesses with
--platform cpu (no test-harness env leaks)."""

import json
import subprocess
import sys

import numpy as np

import jax

from glow_tts_train_tpu import training
from glow_tts_train_tpu.checkpoint import Checkpoint, save_checkpoint
from glow_tts_train_tpu.optimize import current_lr

from helpers import tiny_config


def _make_checkpoint(tmp_path):
    config = tiny_config()
    state = training.create_state(config, jax.random.PRNGKey(0))
    path = tmp_path / "checkpoint_1.npz"
    save_checkpoint(
        Checkpoint(
            params=state.params,
            opt_state=None,
            learning_rate=current_lr(config, 1),
            global_step=1,
            version=config.version,
        ),
        path,
    )
    with open(tmp_path / "config.json", "w") as f:
        config.save(f)
    return path, tmp_path / "config.json"


def _run_infer(ckpt, cfg, stdin_text, *extra):
    import os

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # --platform cpu does the forcing
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    return subprocess.run(
        [
            sys.executable, "-m", "glow_tts_train_tpu.infer",
            str(ckpt), "--config", str(cfg), "--platform", "cpu", *extra,
        ],
        input=stdin_text,
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )


def test_infer_cli_jsonl_contract(tmp_path):
    ckpt, cfg = _make_checkpoint(tmp_path)
    proc = _run_infer(ckpt, cfg, "3 7 12 5 9 14 2\n4 8 2\n", "--batch-size", "2")
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 2
    for line in lines:
        obj = json.loads(line)
        assert set(obj) == {"id", "audio", "mel"}
        assert obj["audio"]["mel_channels"] == 8  # AudioConfig dict rides along
        mel = np.asarray(obj["mel"], np.float32)
        assert mel.ndim == 2 and mel.shape[0] == 8  # [n_mel, t]
        assert mel.shape[1] >= 1 and np.isfinite(mel).all()


def test_infer_cli_csv_and_numpy_dir(tmp_path):
    ckpt, cfg = _make_checkpoint(tmp_path)
    out_dir = tmp_path / "mels_out"
    proc = _run_infer(
        ckpt, cfg, "utt1|3 7 12 5\nutt2|9 14 2 4 8\n",
        "--csv", "--numpy-dir", str(out_dir),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert proc.stdout.strip() == ""  # numpy mode emits files, not JSONL
    files = sorted(p.name for p in out_dir.glob("*.npy"))
    assert files == ["utt1.npy", "utt2.npy"]
    for name in files:
        mel = np.load(out_dir / name, allow_pickle=True)
        assert mel.ndim == 2 and mel.shape[0] == 8
        assert np.isfinite(mel).all()


def test_infer_cli_rejects_out_of_range_ids(tmp_path):
    """Out-of-range phoneme ids must be skipped with a loud error, not
    silently clamped into the embedding (XLA gather would clamp and
    synthesize garbage; the reference's torch embedding raises).  Valid
    lines still synthesize, but the process exits non-zero so positional
    JSONL consumers notice the lost input↔output line correspondence."""
    ckpt, cfg = _make_checkpoint(tmp_path)
    proc = _run_infer(ckpt, cfg, "3 7 999\n4 8 2\n")
    assert proc.returncode == 1, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1  # only the valid utterance synthesized
    assert "out of range" in proc.stderr
    assert "exiting non-zero" in proc.stderr


def test_infer_cli_speaker_validation(tmp_path):
    """--speaker on a single-speaker model exits with a clear parser error
    (previously a bare KeyError('emb_g') deep inside jit tracing)."""
    ckpt, cfg = _make_checkpoint(tmp_path)
    proc = _run_infer(ckpt, cfg, "3 7 12\n", "--speaker", "0")
    assert proc.returncode == 2
    assert "requires a multispeaker model" in proc.stderr


def test_export_cli_speaker_validation(tmp_path):
    """export --speaker out of range / on single-speaker models errors
    before any tracing."""
    import os

    ckpt, cfg = _make_checkpoint(tmp_path)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    proc = subprocess.run(
        [
            sys.executable, "-m", "glow_tts_train_tpu.export",
            str(ckpt), str(tmp_path / "export"), "--config", str(cfg),
            "--speaker", "1",
        ],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert proc.returncode == 2
    assert "requires a multispeaker model" in proc.stderr
