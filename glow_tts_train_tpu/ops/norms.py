"""Channel LayerNorm.

Parity with reference `layers.py:10-28`: normalizes over the *channel*
dimension with eps=1e-4 (nonstandard — not over time).  In our channels-last
layout the channel dim is the last axis, so this is a standard last-axis
layer norm computed in fp32.
"""

import typing

import jax.numpy as jnp
from jax import lax


def layer_norm_init(channels: int) -> typing.Dict[str, jnp.ndarray]:
    return {
        "gamma": jnp.ones((channels,), jnp.float32),
        "beta": jnp.zeros((channels,), jnp.float32),
    }


def layer_norm(
    x: jnp.ndarray, params: typing.Dict[str, jnp.ndarray], eps: float = 1e-4
) -> jnp.ndarray:
    """x: [..., c] -> normalized over last axis."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * params["gamma"] + params["beta"]
    return y.astype(dtype)
