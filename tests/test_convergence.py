"""End-to-end learning sanity: on structured synthetic data (each phoneme id
has a fixed mel signature and lasts exactly 2 frames), training must drive
the loss down substantially and the duration predictor toward log(2)."""

import numpy as np

import jax
import jax.numpy as jnp

from glow_tts_train_tpu import training
from glow_tts_train_tpu.models import (
    forward_gen,
    hyper_from_config,
    store_inverse,
)

from helpers import tiny_config

FRAMES_PER_PHONE = 2


def make_structured_batch(config, rng, b=8, t_x=10):
    n_mel = config.audio.mel_channels
    sig = rng.standard_normal((config.model.num_symbols, n_mel)).astype(np.float32)
    x = rng.integers(1, config.model.num_symbols, size=(b, t_x)).astype(np.int32)
    x_lengths = np.full((b,), t_x, np.int32)
    t_y = t_x * FRAMES_PER_PHONE
    y = np.zeros((b, t_y, n_mel), np.float32)
    for i in range(b):
        for j in range(t_x):
            y[i, j * FRAMES_PER_PHONE : (j + 1) * FRAMES_PER_PHONE] = sig[x[i, j]]
    y += 0.05 * rng.standard_normal(y.shape).astype(np.float32)
    y_lengths = np.full((b,), t_y, np.int32)
    return {
        "x": jnp.asarray(x),
        "x_lengths": jnp.asarray(x_lengths),
        "y": jnp.asarray(y),
        "y_lengths": jnp.asarray(y_lengths),
    }


def test_training_learns_alignments_and_durations():
    config = tiny_config()
    config.warmup_steps = 20
    rng = np.random.default_rng(0)
    batches = [make_structured_batch(config, rng) for _ in range(4)]

    params = training.initialize_model(config, batches[0])
    state = training.create_state(config, jax.random.PRNGKey(0))
    state = training.TrainState(params, state.opt_state, state.step)
    step_fn = training.make_train_step(config, donate=False)

    losses = []
    for i in range(150):
        batch = batches[i % len(batches)]
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))

    assert np.isfinite(losses).all()
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first - 1.0, (first, last)

    # the duration predictor should have learned ~FRAMES_PER_PHONE per phone
    hp = hyper_from_config(config)
    gen_params = store_inverse(state.params)
    x = batches[0]["x"][:2]
    x_lengths = batches[0]["x_lengths"][:2]
    out = forward_gen(
        gen_params, hp, x, x_lengths, y_max_length=64,
        noise_rng=jax.random.PRNGKey(0), noise_scale=0.0,
    )
    (_, _, _, _), _, (attn, logw, _), y_lengths = out
    mean_dur = float(jnp.mean(jnp.exp(logw)))
    assert 1.2 < mean_dur < 3.2, mean_dur
    # generated length ≈ t_x * FRAMES_PER_PHONE
    expected = int(x.shape[1]) * FRAMES_PER_PHONE
    assert abs(int(y_lengths[0]) - expected) <= expected // 2
