"""Epoch-loop behavior: checkpoint cadence, config snapshots, metrics file,
and resume-from-checkpoint through the public training API."""

import json

import numpy as np

import jax
import jax.flatten_util

from glow_tts_train_tpu import training
from glow_tts_train_tpu.checkpoint import load_checkpoint
from glow_tts_train_tpu.config import TrainingConfig

from helpers import random_batch, tiny_config


def test_train_loop_checkpoints_and_metrics(tmp_path):
    config = tiny_config()
    config.epochs = 4
    config.warmup_steps = 10
    rng = np.random.default_rng(0)
    all_batches = [random_batch(config, rng) for _ in range(2)]

    def batches():
        return iter(all_batches)

    state = training.create_state(config, jax.random.PRNGKey(0))
    metrics_path = tmp_path / "metrics.jsonl"
    state = training.train(
        batches,
        config,
        tmp_path,
        state,
        checkpoint_epochs=2,  # only epochs 2 and 4 checkpoint
        log_every=0,
        metrics_path=metrics_path,
    )

    # 4 epochs x 2 batches = 8 steps; step counter started at 1
    assert int(state.step) == 9

    ckpts = sorted(p.name for p in tmp_path.glob("checkpoint_*.npz"))
    assert ckpts == ["checkpoint_5.npz", "checkpoint_9.npz"]
    configs = sorted(p.name for p in tmp_path.glob("config_*.json"))
    assert configs == ["config_5.json", "config_9.json"]

    # config snapshot is loadable and matches
    with open(tmp_path / "config_9.json") as f:
        snap = TrainingConfig.load(f)
    assert snap.model.num_symbols == config.model.num_symbols

    # metrics: one JSON line per epoch with the documented fields
    lines = [json.loads(l) for l in metrics_path.read_text().splitlines()]
    assert [m["epoch"] for m in lines] == [1, 2, 3, 4]
    assert all(np.isfinite(m["avg_loss"]) for m in lines)
    assert all(m["learning_rate"] > 0 for m in lines)

    # resume from the mid-run checkpoint and keep training
    ckpt = load_checkpoint(tmp_path / "checkpoint_5.npz", config)
    assert ckpt.global_step == 5
    resumed = training.TrainState(
        ckpt.params, ckpt.opt_state, np.int32(ckpt.global_step)
    )
    config.epochs = 1
    resumed = training.train(
        batches, config, tmp_path / "resumed", resumed, checkpoint_epochs=1,
        log_every=0,
    )
    assert int(resumed.step) == 7
    assert (tmp_path / "resumed" / "checkpoint_7.npz").exists()


def test_multispeaker_bf16_train_step():
    """Regression: f32 speaker conditioning must not promote the bf16 flow
    scan carry (broke multispeaker fp16_run training: 'carry input and
    carry output must have equal types')."""
    import jax.numpy as jnp

    config = tiny_config(n_speakers=3, gin_channels=8)
    config.fp16_run = True
    rng = np.random.default_rng(3)
    batch = random_batch(config, rng, multispeaker=True)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    assert "speaker_ids" in batch

    state = training.create_state(config, jax.random.PRNGKey(0))
    step_fn = training.make_train_step(config, donate=False)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_remat_strategies_numerically_identical():
    """remat_blocks full/dots/none select how backward gets activations
    (recompute vs stored) — the train-step result must be bit-comparable
    across all three (same graph, same values, fp32 on CPU)."""
    import dataclasses

    rng = np.random.default_rng(5)
    losses, grad_norms = [], []
    for remat in (True, "xin", "dots", "none"):
        config = dataclasses.replace(tiny_config(), remat_blocks=remat)
        batch = random_batch(config, np.random.default_rng(7))
        state = training.create_state(config, jax.random.PRNGKey(0))
        step_fn = training.make_train_step(config, donate=False)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
        grad_norms.append(float(metrics["grad_norm"]))
    assert np.allclose(losses, losses[0], rtol=0, atol=1e-5), losses
    assert np.allclose(grad_norms, grad_norms[0], rtol=1e-5), grad_norms


def test_prefetch_identical_to_synchronous(tmp_path):
    """Background-thread batch prefetch must not change training results —
    only overlap host work with the device step.  Two identical runs, one
    with prefetch_batches=2 and one with 0, must produce the same per-epoch
    losses and final params."""
    import dataclasses

    losses, finals = [], []
    for prefetch in (2, 0):
        config = dataclasses.replace(
            tiny_config(), epochs=3, warmup_steps=10, prefetch_batches=prefetch
        )
        rng = np.random.default_rng(11)
        all_batches = [random_batch(config, rng) for _ in range(3)]
        metrics_path = tmp_path / f"metrics_{prefetch}.jsonl"
        state = training.train(
            lambda: iter(all_batches),
            config,
            tmp_path / f"model_{prefetch}",
            training.create_state(config, jax.random.PRNGKey(0)),
            checkpoint_epochs=100,  # no checkpoints needed
            log_every=0,
            metrics_path=metrics_path,
        )
        losses.append(
            [json.loads(l)["avg_loss"] for l in metrics_path.read_text().splitlines()]
        )
        finals.append(jax.flatten_util.ravel_pytree(state.params)[0])
    assert losses[0] == losses[1]
    np.testing.assert_array_equal(np.asarray(finals[0]), np.asarray(finals[1]))


def test_prefetch_worker_terminates_on_early_exit():
    """Abandoning the prefetch generator mid-epoch (exception in the train
    loop) must release the worker thread — not leave it parked forever on a
    full queue holding prepared batches."""
    import threading
    import time as _time

    from glow_tts_train_tpu.training import _prefetch

    before = threading.active_count()
    gen = _prefetch(iter(range(100)), lambda x: x * 2, size=2)
    assert next(gen) == 0
    gen.close()  # what an exception propagating through the loop does
    deadline = _time.time() + 5
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before


def test_remat_encoder_numerically_identical():
    """remat_encoder only changes how backward obtains encoder activations;
    the train step result must match the default exactly."""
    import dataclasses

    results = []
    for remat_enc in (False, True, "dots"):
        config = dataclasses.replace(tiny_config(), remat_encoder=remat_enc)
        batch = random_batch(config, np.random.default_rng(9))
        state = training.create_state(config, jax.random.PRNGKey(0))
        step_fn = training.make_train_step(config, donate=False)
        _, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        results.append((float(metrics["loss"]), float(metrics["grad_norm"])))
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)
    np.testing.assert_allclose(results[0], results[2], rtol=1e-6)


def test_train_precompiles_shapes(tmp_path, caplog):
    """train(precompile_shapes=...) compiles every expected step shape up
    front via jit lower/compile (no data, no execution) and then trains
    normally."""
    import logging

    config = tiny_config()
    config.epochs = 1
    batches = [
        random_batch(config, np.random.default_rng(s), t_y=26) for s in (0, 1)
    ]
    state = training.create_state(config, jax.random.PRNGKey(0))
    shapes = sorted(
        {(b["x"].shape[0], b["x"].shape[1], b["y"].shape[1]) for b in batches}
    )
    with caplog.at_level(logging.INFO, logger="glow_tts_train_tpu"):
        state = training.train(
            lambda: iter(batches),
            config,
            tmp_path,
            state,
            checkpoint_epochs=10,
            precompile_shapes=shapes,
        )
    assert int(state.step) == 3
    assert any("Precompiled" in r.getMessage() for r in caplog.records)
