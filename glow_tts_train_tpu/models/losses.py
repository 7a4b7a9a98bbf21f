"""Training losses.

Parity with reference `/root/reference/glow_tts_train/utils.py`:
``mle_loss`` (:14-23), ``duration_loss`` (:26-28).  Computed in fp32
regardless of activation dtype.
"""

import math

import jax.numpy as jnp


def mle_loss(z, m, logs, logdet, mask):
    """Flow negative log-likelihood.

    z, m, logs: [b, t, c] (channels-last); logdet: [b]; mask: [b, t, 1].
    Normalized by the masked element count (batch·time·channels), with the
    ½·log(2π) constant added back (utils.py:14-23).
    """
    z = z.astype(jnp.float32)
    m = m.astype(jnp.float32)
    logs = logs.astype(jnp.float32)
    maskf = mask.astype(jnp.float32)
    loss = jnp.sum(logs) + 0.5 * jnp.sum(jnp.exp(-2.0 * logs) * jnp.square(z - m))
    loss = loss - jnp.sum(logdet.astype(jnp.float32))
    denom = jnp.sum(jnp.ones_like(z) * maskf)
    loss = loss / denom
    return loss + 0.5 * math.log(2 * math.pi)


def duration_loss(logw, logw_, lengths):
    """MSE on log-durations normalized by total phoneme count (utils.py:26-28)."""
    diff = (logw.astype(jnp.float32) - logw_.astype(jnp.float32))
    return jnp.sum(jnp.square(diff)) / jnp.sum(lengths.astype(jnp.float32))
