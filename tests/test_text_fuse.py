"""Fused text-side conv-stack kernels (ops/text_pallas.py) vs op-by-op.

The ConvReluNorm prenet (reference layers.py:54-80: conv → norm → relu →
dropout, residual zero-init projection) and the duration-predictor stack
(models.py:41-51: conv → relu → norm → dropout, opposite order) each run
as ONE Pallas kernel with a custom-VJP backward.  Forward outputs and
every parameter gradient must agree with the op-by-op path to fp32
round-off.

CPU runs use Pallas interpret mode (same math, XLA-compiled).
"""

import dataclasses

import jax
import jax.flatten_util as fu
import jax.numpy as jnp
import numpy as np
import pytest

from glow_tts_train_tpu.ops.attention import prenet_apply, prenet_init
from glow_tts_train_tpu.models.glow_tts import (
    duration_predictor_apply,
    duration_predictor_init,
)

from helpers import random_batch, tiny_config


def _inputs(b=3, t=17, c=32, seed=1):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    lens = np.linspace(t, max(t - 7, 2), num=b).astype(int)
    mask = jnp.asarray(
        (np.arange(t)[None, :, None] < lens[:, None, None]).astype(np.float32)
    )
    return x * mask, mask


@pytest.mark.parametrize(
    "kernel_size,n_layers,t",
    [(5, 3, 17), (3, 2, 8), (1, 3, 17)],
    ids=["base_k5L3", "k3L2", "k1"],
)
def test_fused_prenet_matches_op_by_op(kernel_size, n_layers, t):
    h = 32
    params = prenet_init(
        jax.random.PRNGKey(0), h, h, h, kernel_size=kernel_size,
        n_layers=n_layers,
    )
    # the projection is zero-init (residual identity at t=0); perturb it so
    # its gradient path is exercised with nonzero weights
    params["proj"]["w"] = (
        params["proj"]["w"]
        + 0.1 * jax.random.normal(jax.random.PRNGKey(2), params["proj"]["w"].shape)
    )
    x, mask = _inputs(t=t, c=h)

    def loss(p, fused):
        y = prenet_apply(p, x, mask, deterministic=True, fused=fused)
        return jnp.sum(y * jnp.cos(y)), y

    (_, y1), g1 = jax.value_and_grad(loss, has_aux=True)(params, False)
    (_, y2), g2 = jax.value_and_grad(loss, has_aux=True)(params, True)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-5)
    f1, _ = fu.ravel_pytree(g1)
    f2, _ = fu.ravel_pytree(g2)
    scale = float(jnp.max(jnp.abs(f1)))
    np.testing.assert_allclose(
        np.asarray(f2), np.asarray(f1), atol=3e-6 * max(scale, 1.0)
    )


@pytest.mark.parametrize(
    "c_in,kernel_size",
    [(32, 3), (48, 5), (32, 1)],
    ids=["base", "gin_like_k5", "k1"],
)
def test_fused_duration_predictor_matches_op_by_op(c_in, kernel_size):
    f = 40
    params = duration_predictor_init(jax.random.PRNGKey(0), c_in, f, kernel_size)
    x, mask = _inputs(c=c_in)

    def loss(p, fused):
        y = duration_predictor_apply(
            p, x, mask, 0.0, deterministic=True, fused=fused
        )
        return jnp.sum(y * jnp.sin(y)), y

    (_, y1), g1 = jax.value_and_grad(loss, has_aux=True)(params, False)
    (_, y2), g2 = jax.value_and_grad(loss, has_aux=True)(params, True)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-5)
    f1, _ = fu.ravel_pytree(g1)
    f2, _ = fu.ravel_pytree(g2)
    scale = float(jnp.max(jnp.abs(f1)))
    np.testing.assert_allclose(
        np.asarray(f2), np.asarray(f1), atol=3e-6 * max(scale, 1.0)
    )


def test_fused_text_dropout_fallback_off_tpu():
    """Off-TPU with dropout active, both take the op-by-op path (in-kernel
    dropout needs the TPU PRNG) and match it exactly."""
    h = 32
    params = prenet_init(jax.random.PRNGKey(0), h, h, h)
    x, mask = _inputs(c=h)
    rng = jax.random.PRNGKey(9)
    y1 = prenet_apply(params, x, mask, rng=rng, deterministic=False)
    y2 = prenet_apply(params, x, mask, rng=rng, deterministic=False, fused=True)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y1))

    dp = duration_predictor_init(jax.random.PRNGKey(1), h, 40, 3)
    y1 = duration_predictor_apply(dp, x, mask, 0.3, rng=rng, deterministic=False)
    y2 = duration_predictor_apply(
        dp, x, mask, 0.3, rng=rng, deterministic=False, fused=True
    )
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y1))


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="in-kernel dropout draws from the TPU hardware PRNG, which has "
    "no interpret-mode lowering (pltpu.prng_seed); runs on real TPU",
)
def test_fused_text_inkernel_dropout():
    """The in-kernel hardware-PRNG dropout path for both text kernels
    (what a real TPU training step runs): statistics + deterministic
    replay + finite grads, bypassing the dropout fallback gating."""
    from glow_tts_train_tpu.ops.text_pallas import (
        duration_predictor_fused,
        prenet_fused,
    )

    h = 32
    x, mask = _inputs(c=h)
    pn = prenet_init(jax.random.PRNGKey(0), h, h, h)
    dp = duration_predictor_init(jax.random.PRNGKey(1), h, 40, 3)

    for name, fn, params in (
        ("prenet", lambda p, key: prenet_fused(
            p, x, mask, p_dropout=0.5, rng=key, deterministic=False,
        ), pn),
        ("dp", lambda p, key: duration_predictor_fused(
            p, x, mask, p_dropout=0.4, rng=key, deterministic=False,
        ), dp),
    ):
        y = fn(params, jax.random.PRNGKey(5))
        assert np.isfinite(np.asarray(y)).all(), name
        np.testing.assert_array_equal(
            np.asarray(fn(params, jax.random.PRNGKey(5))), np.asarray(y),
            err_msg=name,
        )
        assert float(
            jnp.max(jnp.abs(fn(params, jax.random.PRNGKey(6)) - y))
        ) > 0, name

        grads = jax.grad(
            lambda p: jnp.sum(fn(p, jax.random.PRNGKey(7)) ** 2)
        )(params)
        flat, _ = fu.ravel_pytree(grads)
        assert np.isfinite(np.asarray(flat)).all(), name
        assert float(jnp.max(jnp.abs(flat))) > 0, name


def test_fused_text_train_step_equivalent():
    """Full jitted train step with encoder_fuse (which also fuses prenet +
    duration predictor): same loss/grad-norm as the unfused path."""
    from glow_tts_train_tpu import training

    losses = {}
    for fuse in (False, True):
        config = dataclasses.replace(
            tiny_config(p_dropout=0.0, p_dropout_dec=0.0),
            encoder_fuse=fuse,
        )
        batch = random_batch(config, np.random.default_rng(11))
        state = training.create_state(config, jax.random.PRNGKey(0))
        step_fn = training.make_train_step(config, donate=False)
        for i in range(3):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        losses[fuse] = (float(metrics["loss"]), float(metrics["grad_norm"]))
    assert np.allclose(losses[True], losses[False], rtol=1e-5), losses


def test_fused_dp_multispeaker_shapes():
    """Multispeaker: the DP input concatenates the (non-detached) speaker
    vector — c_in = h + gin exercises a non-square first conv."""
    from glow_tts_train_tpu import training

    losses = {}
    for fuse in (False, True):
        config = dataclasses.replace(
            tiny_config(
                p_dropout=0.0, p_dropout_dec=0.0, n_speakers=3,
                gin_channels=12,
            ),
            encoder_fuse=fuse,
        )
        batch = random_batch(
            config, np.random.default_rng(13), multispeaker=True
        )
        state = training.create_state(config, jax.random.PRNGKey(0))
        step_fn = training.make_train_step(config, donate=False)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        losses[fuse] = float(metrics["loss"])
    assert np.allclose(losses[True], losses[False], rtol=1e-5), losses
