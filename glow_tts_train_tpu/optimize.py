"""Noam-scheduled Adam via optax.

Parity with reference `/root/reference/glow_tts_train/optimize.py`:
* Adam(lr=1.0, betas=(0.9, 0.98), eps=1e-9) defaults from TrainingConfig
* Noam scale ``d^-0.5 · min(step^-0.5, step · warmup^-1.5)`` recomputed every
  step (optimize.py:32-48); reference step_num starts at 1, so the schedule
  here evaluates at count+1
* gradient value-clipping before the Adam update (train.py:138,145 +
  utils.py:118-132)

Improvement over the reference: the schedule step is part of the optimizer
state, so resume continues the Noam curve instead of restarting it
(reference quirk: optimize.py:27-30 restarts step_num=1 on resume).
"""

import typing

import jax.numpy as jnp
import optax

from .config import TrainingConfig


def noam_schedule(
    dim_model: int, warmup_steps: int, base_lr: float
) -> typing.Callable[[jnp.ndarray], jnp.ndarray]:
    def schedule(count):
        step = jnp.asarray(count, jnp.float32) + 1.0
        scale = dim_model ** -0.5 * jnp.minimum(
            step ** -0.5, step * warmup_steps ** -1.5
        )
        return base_lr * scale

    return schedule


def make_optimizer(config: TrainingConfig) -> optax.GradientTransformation:
    if config.scheduler == "noam":
        lr: typing.Union[float, typing.Callable] = noam_schedule(
            config.model.hidden_channels, config.warmup_steps, config.learning_rate
        )
    else:
        lr = config.learning_rate

    return optax.chain(
        optax.clip(config.grad_clip),  # element-wise value clip (utils.py:130)
        optax.scale_by_adam(
            b1=config.betas[0], b2=config.betas[1], eps=config.eps
        ),
        optax.scale_by_learning_rate(lr),  # negates for descent
    )


def current_lr(config: TrainingConfig, step: int) -> float:
    """The lr the schedule applies at 1-indexed global step (for logging and
    checkpoint metadata parity with optimizer.cur_lr)."""
    if config.scheduler != "noam":
        return config.learning_rate
    return float(
        noam_schedule(
            config.model.hidden_channels, config.warmup_steps, config.learning_rate
        )(max(step - 1, 0))
    )
