"""Sequence masks and duration→alignment path generation.

Behavioral parity with reference `/root/reference/glow_tts_train/utils.py`:
``sequence_mask`` (:52-56), ``generate_path`` (:99-115).  Layout here is
channels-last: masks are ``[b, t, 1]`` so they broadcast against ``[b, t, c]``.
"""

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """Boolean mask [b, t]: True where position < length.

    ``max_length`` must be static (padded shape) under jit.
    """
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def time_mask(lengths: jnp.ndarray, max_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Float mask [b, t, 1] for channels-last activations."""
    return sequence_mask(lengths, max_length).astype(dtype)[:, :, None]


def generate_path(duration: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convert integer durations to a hard monotonic alignment path.

    duration: [b, t_x] (non-negative, typically ceil of predicted durations)
    mask:     [b, t_x, t_y] attention mask
    returns:  [b, t_x, t_y] 0/1 path where row x covers frames
              [cum_dur[x-1], cum_dur[x])

    Same cumsum + mask + first-difference construction as reference
    utils.py:99-115.
    """
    b, t_x, t_y = mask.shape
    cum_duration = jnp.cumsum(duration, axis=1)  # [b, t_x]
    frame_pos = jnp.arange(t_y, dtype=cum_duration.dtype)
    # path[b, x, y] = y < cum_dur[b, x]
    path = (frame_pos[None, None, :] < cum_duration[:, :, None]).astype(mask.dtype)
    # first difference along t_x turns prefix coverage into per-row bands
    path = path - jnp.pad(path, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return path * mask
