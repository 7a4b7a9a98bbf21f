"""Fused gated tanh·sigmoid activation (WaveNet gate).

Parity with reference `utils.py:31-38` (`fused_add_tanh_sigmoid_multiply`,
a @torch.jit.script fused kernel).  On TPU we express it as plain jnp ops and
let XLA fuse the add/tanh/sigmoid/mul chain into the surrounding convs — this
is exactly the kind of elementwise chain XLA fuses into one VPU loop, so no
hand-written kernel is needed for the default path.
"""

import jax
import jax.numpy as jnp


def gated_tanh_sigmoid(a: jnp.ndarray, b: jnp.ndarray, n_channels: int) -> jnp.ndarray:
    """acts = tanh((a+b)[..., :n]) * sigmoid((a+b)[..., n:]).

    a, b: [batch, t, 2*n_channels] (channels-last).
    """
    s = a + b
    return jnp.tanh(s[..., :n_channels]) * jax.nn.sigmoid(s[..., n_channels:])
