"""Noam-Adam optimizer tests (reference optimize.py:32-55 formula parity)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from glow_tts_train_tpu.config import TrainingConfig
from glow_tts_train_tpu.optimize import current_lr, make_optimizer, noam_schedule


def reference_lr_scale(step_num, dim_model, warmup_steps):
    """The reference's Noam scale (optimize.py:32-39), step_num 1-indexed."""
    return np.power(dim_model, -0.5) * np.min(
        [np.power(step_num, -0.5), step_num * np.power(warmup_steps, -1.5)]
    )


def test_noam_schedule_matches_reference():
    dim, warmup, base_lr = 192, 4000, 1.0
    sched = noam_schedule(dim, warmup, base_lr)
    for step_num in [1, 2, 100, 3999, 4000, 4001, 10000, 500000]:
        expected = base_lr * reference_lr_scale(step_num, dim, warmup)
        # schedule count is 0-indexed; reference step_num starts at 1
        got = float(sched(step_num - 1))
        np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_current_lr_matches_schedule():
    config = TrainingConfig()
    assert abs(
        current_lr(config, 4000)
        - reference_lr_scale(4000, config.model.hidden_channels, 4000)
    ) < 1e-9


def test_optimizer_clips_then_adams():
    config = TrainingConfig()
    config.grad_clip = 0.5
    tx = make_optimizer(config)
    params = {"w": jnp.zeros((4,))}
    state = tx.init(params)
    grads = {"w": jnp.asarray([10.0, -10.0, 0.1, 0.0])}
    updates, _ = tx.update(grads, state, params)
    u = np.asarray(updates["w"])
    # lr at step 1
    lr1 = reference_lr_scale(1, config.model.hidden_channels, config.warmup_steps)
    # clipped grads ±0.5 -> adam normalizes to ±1-ish * lr
    np.testing.assert_allclose(u[0], -lr1, rtol=1e-3)
    np.testing.assert_allclose(u[1], lr1, rtol=1e-3)
    assert u[3] == 0.0


def test_lr_rises_then_decays():
    sched = noam_schedule(192, 100, 1.0)
    lrs = [float(sched(i)) for i in range(300)]
    peak = int(np.argmax(lrs))
    assert 95 <= peak + 1 <= 101  # peak at warmup boundary
    assert lrs[-1] < lrs[peak]
    assert all(np.diff(lrs[:peak]) > 0)
