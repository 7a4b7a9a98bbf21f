"""TRUE multi-process distributed training through the real CLI: two
OS processes rendezvous via jax.distributed (--coordinator), federate
their CPU devices into one global mesh, and train with cross-process
collectives (Gloo) — the CPU stand-in for a multi-host TPU pod.

This is the test the reference never had (its DDP/NCCL path is untested,
SURVEY §4): it exercises per-process data sharding
(make_array_from_process_local_data), the cross-host-deterministic batch
plan, chief-gated .npz writes, and the all-process orbax collective save.
"""

import json
import os
import socket
import subprocess
import sys
import pytest

import numpy as np

# measured 2026-08-19: 2-process jax.distributed subprocess runs (~4 min); `make test` skips, `make test-all` runs
pytestmark = pytest.mark.slow


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_pair(tmp_path, mels_dir, extra=(), attempts=3):
    """Launch the 2-process rendezvous; retry on a coordinator-port bind
    race (inherent TOCTOU of port picking) or a timeout (the two processes
    each compile the full train step — under heavy machine contention,
    e.g. the full suite alongside a TPU soak, an attempt can exceed the
    window; observed twice-in-a-row on 2026-08-18, hence 3 attempts)."""
    for attempt in range(attempts):
        port = _free_port()
        procs = [
            _launch(tmp_path, mels_dir, port, i, extra=extra) for i in (0, 1)
        ]
        try:
            outs = [p.communicate(timeout=600)[0] for p in procs]
        except subprocess.TimeoutExpired:
            # surface whichever process actually crashed before killing the
            # survivor — a bare TimeoutExpired would hide the root cause
            partial = []
            for p in procs:
                if p.poll() is None:
                    p.kill()
                partial.append(p.communicate()[0])
            if attempt + 1 < attempts:
                continue
            raise AssertionError(
                "rendezvous timed out; process outputs:\n"
                + "\n---\n".join(out[-2000:] for out in partial)
            )
        if all(p.returncode == 0 for p in procs):
            return outs
        # Any first-attempt failure retries once: the known-transient modes
        # (coordinator-port bind race, rendezvous barrier timeout under
        # machine contention) don't have stable message texts across jax
        # versions, and a real bug still fails deterministically on the
        # retry.  The last attempt asserts with the full process output.
        if attempt + 1 >= attempts:
            for p, out in zip(procs, outs):
                assert p.returncode == 0, out[-3000:]
    raise AssertionError("unreachable")


def _write_corpus(tmp_path, n_utts=24):
    rng = np.random.default_rng(0)
    mels_dir = tmp_path / "mels"
    mels_dir.mkdir()
    with open(tmp_path / "phonemes.csv", "w") as f:
        for i in range(n_utts):
            utt = f"u{i:02d}"
            n = int(rng.integers(4, 10))
            f.write(f"{utt}|{' '.join(map(str, rng.integers(1, 20, n)))}\n")
            mel = rng.standard_normal((8, int(rng.integers(2 * n + 2, 40))))
            np.save(mels_dir / f"{utt}.npy", mel.astype(np.float32))
    return mels_dir


def _config(**overrides):
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
    config.update(overrides)
    return config


def _launch(tmp_path, mels_dir, port, proc_id, extra=()):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        fl
        for fl in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in fl
    )
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    return subprocess.Popen(
        [
            sys.executable, "-m", "glow_tts_train_tpu",
            "--output", str(tmp_path / "model"),
            "--dataset", "0", str(tmp_path / "phonemes.csv"), str(mels_dir),
            "--mels-dir",
            "--config", str(tmp_path / "config.json"),
            "--platform", "cpu", "--virtual-devices", "2",
            "--coordinator", f"localhost:{port}",
            "--num-processes", "2", "--process-id", str(proc_id),
            "--metrics-file", str(tmp_path / f"metrics_{proc_id}.jsonl"),
            *extra,
        ],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def test_two_process_train_cli(tmp_path):
    mels_dir = _write_corpus(tmp_path)
    with open(tmp_path / "config.json", "w") as f:
        json.dump(_config(), f)

    outs = _run_pair(tmp_path, mels_dir)

    # chief-gated artifacts: exactly one process wrote them
    model_dir = tmp_path / "model"
    assert (model_dir / "checkpoint_7.npz").exists()
    assert (model_dir / "config_7.json").exists()
    metrics = [
        json.loads(l)
        for l in (tmp_path / "metrics_0.jsonl").read_text().splitlines()
    ]
    assert len(metrics) == 2 and all(
        np.isfinite(m["avg_loss"]) for m in metrics
    )
    assert not (tmp_path / "metrics_1.jsonl").exists()  # chief-gated

    # 24 utts / (8 per-process batch x 2 procs) = 1 global batch of 16 + drop
    # -> "global step" advanced identically in both logs
    for out in outs:
        assert "Training finished" in out


def test_two_process_restore_and_continue_matches_uninterrupted(tmp_path):
    """The recovery story end-to-end (VERDICT r4 weak #5; reference
    __main__.py:251-262): 2-process run → orbax collective save → FRESH
    2-process run restoring it → 2 more epochs.  The final state must
    match a 4-epoch uninterrupted run bit-for-bit-ish (same Noam count,
    same per-step rng folds, and — via the resume epoch-continuation in
    __main__.py — the same shuffled batch sequence)."""
    from glow_tts_train_tpu.checkpoint import load_checkpoint
    from glow_tts_train_tpu.config import TrainingConfig

    mels_dir = _write_corpus(tmp_path)

    # uninterrupted control: 4 epochs straight through
    with open(tmp_path / "config.json", "w") as f:
        json.dump(_config(epochs=4), f)
    _run_pair(tmp_path, mels_dir, extra=("--output", str(tmp_path / "ctrl")))

    # interrupted run: 2 epochs, orbax save...
    with open(tmp_path / "config.json", "w") as f:
        json.dump(_config(epochs=2, checkpoint_format="orbax"), f)
    _run_pair(tmp_path, mels_dir, extra=("--output", str(tmp_path / "m1")))

    def latest(pattern):
        return max(
            tmp_path.glob(pattern),
            key=lambda p: int(p.stem.rsplit("_", 1)[1]),
        )

    # ...then a FRESH 2-process rendezvous restores it and continues
    _run_pair(
        tmp_path, mels_dir,
        extra=(
            "--output", str(tmp_path / "m2"),
            "--checkpoint", str(latest("m1/checkpoint_*.orbax")),
        ),
    )

    config = TrainingConfig.from_dict(_config())
    ctrl = load_checkpoint(latest("ctrl/checkpoint_*.npz"), config)
    resumed = load_checkpoint(latest("m2/checkpoint_*.orbax"), config)

    # both ran 24//16=1... steps_per_epoch x 4 epochs in total
    assert resumed.global_step == ctrl.global_step > 1

    import jax

    leaves_c, tree_c = jax.tree.flatten(ctrl.params)
    leaves_r, tree_r = jax.tree.flatten(resumed.params)
    assert tree_c == tree_r
    for lc, lr in zip(leaves_c, leaves_r):
        np.testing.assert_allclose(
            np.asarray(lc), np.asarray(lr), rtol=0, atol=1e-6
        )
    # optimizer continuity too: Adam moments + Noam count survive the trip
    mc, mr = jax.tree.leaves(ctrl.opt_state), jax.tree.leaves(resumed.opt_state)
    assert len(mc) == len(mr)
    for lc, lr in zip(mc, mr):
        np.testing.assert_allclose(
            np.asarray(lc), np.asarray(lr), rtol=0, atol=1e-6
        )


def test_two_process_orbax_collective_save(tmp_path):
    """checkpoint_format=orbax saves are a cross-process collective (every
    process writes its addressable shards) — run it with REAL processes."""
    mels_dir = _write_corpus(tmp_path)
    with open(tmp_path / "config.json", "w") as f:
        json.dump(_config(checkpoint_format="orbax", epochs=1), f)

    _run_pair(tmp_path, mels_dir)

    ckpts = list((tmp_path / "model").glob("checkpoint_*.orbax"))
    assert len(ckpts) == 1, list((tmp_path / "model").iterdir())
    assert (ckpts[0] / "model").exists() or any(ckpts[0].iterdir())
