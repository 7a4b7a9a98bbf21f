"""Full-stack multi-device training through the REAL CLI: corpus on disk →
data pipeline → 8-device mesh → jit train step with GSPMD collectives →
checkpoints.  Runs in a fresh subprocess (no test-harness env) with
``--platform cpu --virtual-devices 8`` — the same code path an 8-chip
slice executes, minus the silicon."""

import json
import subprocess
import sys
import pytest

# measured 2026-08-19: full-CLI subprocess on an 8-device mesh (~1 min); `make test` skips, `make test-all` runs
pytestmark = pytest.mark.slow


def test_train_cli_on_virtual_eight_device_mesh(tmp_path):
    import numpy as np

    rng = np.random.default_rng(0)
    mels_dir = tmp_path / "mels"
    mels_dir.mkdir()
    with open(tmp_path / "phonemes.csv", "w") as f:
        for i in range(24):
            utt = f"u{i:02d}"
            n = int(rng.integers(4, 10))
            f.write(f"{utt}|{' '.join(map(str, rng.integers(1, 20, n)))}\n")
            mel = rng.standard_normal((8, int(rng.integers(2 * n + 2, 40))))
            np.save(mels_dir / f"{utt}.npy", mel.astype(np.float32))
    config = {
        "epochs": 2,
        "batch_size": 8,
        "warmup_steps": 10,
        "bucket_size_text": 8,
        "bucket_size_mel": 16,
        "audio": {"mel_channels": 8},
        "model": {
            "num_symbols": 20, "hidden_channels": 16, "filter_channels": 32,
            "filter_channels_dp": 16, "n_blocks_dec": 2, "n_layers_enc": 2,
            "n_block_layers": 2, "hidden_channels_enc": 16,
            "hidden_channels_dec": 16,
        },
    }
    with open(tmp_path / "config.json", "w") as f:
        json.dump(config, f)

    import os

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the CLI flag does the forcing
    env["XLA_FLAGS"] = " ".join(
        fl
        for fl in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in fl
    )
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    proc = subprocess.run(
        [
            sys.executable, "-m", "glow_tts_train_tpu",
            "--output", str(tmp_path / "model"),
            "--dataset", "0", str(tmp_path / "phonemes.csv"), str(mels_dir),
            "--mels-dir",
            "--config", str(tmp_path / "config.json"),
            "--platform", "cpu", "--virtual-devices", "8",
            "--metrics-file", str(tmp_path / "metrics.jsonl"),
        ],
        env=env,
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "Mesh: 8 devices" in proc.stderr, proc.stderr[-2000:]
    metrics = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(metrics) == 2
    assert all(np.isfinite(m["avg_loss"]) for m in metrics)
    # 24 utts / batch 8 = 3 steps/epoch; checkpoint at final step exists
    ckpts = list((tmp_path / "model").glob("checkpoint_*.npz"))
    assert ckpts, list((tmp_path / "model").iterdir())


def test_train_cli_orbax_checkpoint_and_resume(tmp_path):
    """The CLI writes .orbax directory checkpoints (checkpoint_format) and
    resumes from one with the Noam schedule intact — the pod-scale format
    exercised through the real entry point."""
    import os

    import numpy as np

    rng = np.random.default_rng(1)
    with open(tmp_path / "phonemes.csv", "w") as f, open(
        tmp_path / "mels.jsonl", "w"
    ) as g:
        for i in range(8):
            utt = f"u{i:02d}"
            n = int(rng.integers(4, 10))
            f.write(f"{utt}|{' '.join(map(str, rng.integers(1, 20, n)))}\n")
            mel = rng.standard_normal((8, int(rng.integers(2 * n + 2, 40))))
            g.write(
                json.dumps({"id": utt, "mel": mel.round(3).tolist()}) + "\n"
            )
    config = {
        "epochs": 2,
        "batch_size": 4,
        "warmup_steps": 10,
        "checkpoint_format": "orbax",
        "bucket_size_text": 8,
        "bucket_size_mel": 16,
        "audio": {"mel_channels": 8},
        "model": {
            "num_symbols": 20, "hidden_channels": 16, "filter_channels": 32,
            "filter_channels_dp": 16, "n_blocks_dec": 2, "n_layers_enc": 2,
            "n_block_layers": 2, "hidden_channels_enc": 16,
            "hidden_channels_dec": 16,
        },
    }
    with open(tmp_path / "config.json", "w") as f:
        json.dump(config, f)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        fl
        for fl in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in fl
    )
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    base_cmd = [
        sys.executable, "-m", "glow_tts_train_tpu",
        "--output", str(tmp_path / "model"),
        "--dataset", "0", str(tmp_path / "phonemes.csv"),
        str(tmp_path / "mels.jsonl"),
        "--config", str(tmp_path / "config.json"),
        "--platform", "cpu", "--no-mesh",
    ]
    proc = subprocess.run(
        base_cmd, env=env, cwd="/root/repo", capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    ckpts = sorted((tmp_path / "model").glob("checkpoint_*.orbax"))
    assert ckpts, list((tmp_path / "model").iterdir())

    proc = subprocess.run(
        base_cmd + ["--checkpoint", str(ckpts[-1])],
        env=env, cwd="/root/repo", capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "Loaded checkpoint" in proc.stderr
    # resumed run continues the global step (2 epochs x 2 steps: 5 -> 9)
    final = sorted(
        (tmp_path / "model").glob("checkpoint_*.orbax"),
        key=lambda p: int(p.stem.split("_")[1]),
    )[-1]
    assert int(final.stem.split("_")[1]) == 9, final
