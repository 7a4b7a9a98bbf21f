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

from helpers import fd_directional_grad_check, random_batch, tiny_config


@pytest.fixture(autouse=True)
def _fp32_matmuls():
    """TPU lowers f32 dots/convs to single-pass bf16 MXU by default; these
    parity tolerances assume fp32 round-off.  The Mosaic kernels compute
    f32 matmuls at full precision, so at default precision the two paths
    legitimately diverge by ~1e-2 (measured on v5e).  No-op on CPU."""
    with jax.default_matmul_precision("highest"):
        yield


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


def test_fused_text_inkernel_dropout():
    """The in-kernel dropout path for both text kernels (hardware PRNG on
    TPU, portable interpret-mode bits elsewhere): statistics, deterministic
    replay, and the custom-VJP gradients checked EXACTLY against jax.grad
    of the kernels' own forward math run outside Pallas with the same
    portable masks (the *_fwd_math functions are pure jnp — the perfect
    autodiff oracle for the hand-written backward, incl. its dropout
    branches).  On a TPU backend the exact comparison forces interpret
    mode (hardware bits are not replayable outside the kernel) and the
    real hardware path is checked by central differences instead."""
    from glow_tts_train_tpu.ops import text_pallas as tp

    h = 32
    x, mask = _inputs(c=h)
    b = x.shape[0]
    pn = prenet_init(jax.random.PRNGKey(0), h, h, h)
    # the projection is zero-init: without perturbing it the residual
    # swallows the conv stack entirely and dropout is invisible
    pn["proj"]["w"] = pn["proj"]["w"] + 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), pn["proj"]["w"].shape
    )
    dp = duration_predictor_init(jax.random.PRNGKey(1), h, 40, 3)
    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal(x.shape), jnp.float32
    )
    key = jax.random.PRNGKey(7)
    mask_b = jnp.broadcast_to(mask, (b, x.shape[1], 1))

    def oracle(params, fwd_math, weights_fn, st_builder):
        from glow_tts_train_tpu.ops.wn_pallas import portable_ops

        seed_f, st_tup = st_builder()
        st = dict(
            tp._st_from_key(tp._TextKey(st_tup, True)), interpret=True
        )
        weights = weights_fn(params, jnp.float32)
        outs = []
        with portable_ops():
            for i in range(b):
                out, _ = fwd_math(
                    x[i], mask_b[i], weights, dict(st, seed=seed_f[0] + i)
                )
                outs.append(out)
        return jnp.stack(outs)

    # --- prenet ---
    def pn_kernel(p, k, interpret=None):
        return tp.prenet_fused(
            p, x, mask, p_dropout=0.5, rng=k, deterministic=False,
            interpret=interpret,
        )

    def pn_oracle(p):
        return oracle(
            p, lambda *a: tp._prenet_fwd_math(*a), tp.prenet_weights,
            lambda: tp._seed_and_st(3, 5, 0.5, key, False),
        )

    # --- duration predictor (stack only; proj handled by the wrapper) ---
    def dp_kernel(p, k, interpret=None):
        return tp.duration_predictor_fused(
            p, x, mask, p_dropout=0.4, rng=k, deterministic=False,
            interpret=interpret,
        )

    def dp_oracle(p):
        from glow_tts_train_tpu.ops.conv import conv1d

        h2 = oracle(
            p, lambda *a: tp._dp_fwd_math(*a), tp.dp_weights,
            lambda: tp._seed_and_st(2, 3, 0.4, key, False),
        )
        return conv1d(h2 * mask, p["proj"]) * mask

    for name, kernel, orc, params in (
        ("prenet", pn_kernel, pn_oracle, pn),
        ("dp", dp_kernel, dp_oracle, dp),
    ):
        y = kernel(params, jax.random.PRNGKey(5))
        assert np.isfinite(np.asarray(y)).all(), name
        np.testing.assert_array_equal(
            np.asarray(kernel(params, jax.random.PRNGKey(5))),
            np.asarray(y), err_msg=name,
        )
        assert float(
            jnp.max(jnp.abs(kernel(params, jax.random.PRNGKey(6)) - y))
        ) > 0, name

        # forward: oracle reproduces the kernel (same masks, same math —
        # interpret mode forced so the portable PRNG is in play even on a
        # TPU backend, where the real kernel draws hardware bits instead)
        y_k = kernel(params, key, interpret=True)
        y_o = orc(params)
        np.testing.assert_allclose(
            np.asarray(y_o), np.asarray(y_k), atol=1e-5, err_msg=name
        )

        c_out = y_k.shape[-1]
        g_k = jax.grad(
            lambda p: jnp.sum(
                kernel(p, key, interpret=True) * cot[..., :c_out]
            )
        )(params)
        g_o = jax.grad(
            lambda p: jnp.sum(orc(p) * cot[..., :c_out])
        )(params)
        f_k, _ = fu.ravel_pytree(g_k)
        f_o, _ = fu.ravel_pytree(g_o)
        scale = float(jnp.max(jnp.abs(f_o)))
        np.testing.assert_allclose(
            np.asarray(f_k), np.asarray(f_o),
            atol=3e-6 * max(scale, 1.0), err_msg=name,
        )

        # hardware path: FD oracle through the real Mosaic kernel (TPU
        # PRNG — no portable oracle can replay its bits)
        if jax.default_backend() == "tpu":
            fd_directional_grad_check(
                lambda p: jnp.sum(kernel(p, key) * cot[..., :c_out]),
                params,
            )


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
