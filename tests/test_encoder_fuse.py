"""Fused encoder-layer Pallas kernel (ops/encoder_pallas.py) vs op-by-op.

One whole text-encoder layer — windowed rel-pos MHA, dropout, residual
layernorm, conv-FFN, residual layernorm — runs as ONE Pallas kernel with a
custom-VJP backward.  It must be a drop-in numerical replacement for the
mha_apply → layer_norm → ffn_apply → layer_norm chain: forward outputs and
every parameter gradient agree to fp32 round-off.  Reference layer
semantics: attentions.py:55-73 (layer wiring), :203-264 (attention core
incl. the [t, 2t-1] rel-pos logits the kernel replaces with a banded add),
:368-381 (FFN), layers.py:10-28 (layernorm, eps 1e-4).

CPU runs use Pallas interpret mode (same math, XLA-compiled).
"""

import dataclasses

import jax
import jax.flatten_util as fu
import jax.numpy as jnp
import numpy as np
import pytest

from glow_tts_train_tpu.ops.attention import encoder_apply, encoder_init

from helpers import fd_directional_grad_check, random_batch, tiny_config

# measured 2026-08-19: interpret-mode Pallas encoder-kernel sweeps (~2 min); `make test` skips, `make test-all` runs
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _fp32_matmuls():
    """TPU lowers f32 dots/convs to single-pass bf16 MXU by default; these
    parity tolerances assume fp32 round-off.  The Mosaic kernels compute
    f32 matmuls at full precision, so at default precision the two paths
    legitimately diverge by ~1e-2 (measured on v5e).  No-op on CPU."""
    with jax.default_matmul_precision("highest"):
        yield


def _encoder(h=32, f=64, n_heads=2, n_layers=2, kernel_size=3, window=4,
             seed=0):
    params = encoder_init(
        jax.random.PRNGKey(seed), h, f, n_heads, n_layers, kernel_size,
        window,
    )
    return params, dict(n_heads=n_heads, window_size=window)


def _inputs(b=3, t=17, h=32, seed=1):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
    lens = np.linspace(t, max(t - 7, 2), num=b).astype(int)
    mask = jnp.asarray(
        (np.arange(t)[None, :, None] < lens[:, None, None]).astype(np.float32)
    )
    return x * mask, mask


@pytest.mark.parametrize(
    "enc_over,in_over",
    [
        ({}, {}),
        ({"kernel_size": 1}, {}),
        ({"window": 1}, {}),
        ({"n_layers": 3, "h": 16, "f": 24, "n_heads": 4}, {}),
        # t=3 < window+1: the rel table covers offsets that never occur
        ({}, {"t": 3}),
    ],
    ids=["base", "ffn_k1", "w1", "L3h16H4", "short_t"],
)
def test_fused_encoder_matches_op_by_op(enc_over, in_over):
    params, kw = _encoder(**enc_over)
    x, mask = _inputs(h=enc_over.get("h", 32), **in_over)

    def loss(p, fused):
        y = encoder_apply(
            p, x, mask, **kw, deterministic=True, fused=fused
        )
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


def test_fused_encoder_unroll_matches_scan():
    params, kw = _encoder()
    x, mask = _inputs()
    y_scan = encoder_apply(
        params, x, mask, **kw, deterministic=True, fused=True
    )
    y_unroll = encoder_apply(
        params, x, mask, **kw, deterministic=True, fused=True, unroll=True
    )
    np.testing.assert_allclose(
        np.asarray(y_unroll), np.asarray(y_scan), atol=1e-6
    )


def test_fused_encoder_unsupported_configs_fall_back():
    """window_size=None and block_length both silently take the op-by-op
    path (bitwise identical — it IS that path)."""
    x, mask = _inputs()
    for window, kw in (
        (None, dict(n_heads=2, window_size=None)),
        (4, dict(n_heads=2, window_size=4, block_length=2)),
    ):
        params, _ = _encoder(window=window)
        y1 = encoder_apply(params, x, mask, **kw, deterministic=True)
        y2 = encoder_apply(
            params, x, mask, **kw, deterministic=True, fused=True
        )
        np.testing.assert_array_equal(np.asarray(y2), np.asarray(y1))


def test_fused_encoder_dropout_fallback_off_tpu():
    """Off-TPU with dropout active, encoder_apply silently takes the
    op-by-op path (in-kernel dropout needs the TPU PRNG) and matches it
    exactly."""
    params, kw = _encoder()
    x, mask = _inputs()
    rng = jax.random.PRNGKey(9)
    y1 = encoder_apply(
        params, x, mask, **kw, p_dropout=0.3, rng=rng, deterministic=False
    )
    y2 = encoder_apply(
        params, x, mask, **kw, p_dropout=0.3, rng=rng, deterministic=False,
        fused=True,
    )
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y1))


def test_fused_encoder_train_step_equivalent():
    """Full jitted train step: same loss/grad-norm as the unfused path."""
    from glow_tts_train_tpu import training

    losses = {}
    for fuse in (False, True):
        config = dataclasses.replace(
            tiny_config(p_dropout=0.0, p_dropout_dec=0.0),
            encoder_fuse=fuse,
        )
        batch = random_batch(config, np.random.default_rng(7))
        state = training.create_state(config, jax.random.PRNGKey(0))
        step_fn = training.make_train_step(config, donate=False)
        for i in range(3):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        losses[fuse] = (float(metrics["loss"]), float(metrics["grad_norm"]))
    assert np.allclose(losses[True], losses[False], rtol=1e-5), losses


def test_fused_encoder_gen_path():
    """forward_gen (inference) through the fused encoder matches unfused."""
    from glow_tts_train_tpu.models import forward_gen, hyper_from_config, init_model

    config = tiny_config(p_dropout=0.0)
    hp = hyper_from_config(config)
    params = init_model(jax.random.PRNGKey(0), hp)
    x = jnp.asarray([[3, 7, 12, 5, 9, 14, 2, 0]], jnp.int32)
    x_lengths = jnp.asarray([7], jnp.int32)
    outs = {}
    for fuse in (False, True):
        hp_f = hp._replace(encoder_fuse=fuse)
        (y, *_), attn, logw, y_lengths = forward_gen(
            params, hp_f, x, x_lengths, y_max_length=32,
            noise_rng=jax.random.PRNGKey(1), noise_scale=0.0,
        )
        outs[fuse] = (np.asarray(y), np.asarray(y_lengths))
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=2e-5)
    np.testing.assert_array_equal(outs[True][1], outs[False][1])


def test_fused_encoder_inkernel_dropout():
    """The in-kernel dropout path.  Two regimes:

    * exact autodiff oracle — the kernel forced to interpret mode (portable
      PRNG bits) vs its own forward math run outside Pallas with the same
      bits and jax.grad'd; masks match bit-for-bit, so outputs and every
      parameter gradient agree to fp32 round-off.  This is what CPU runs
      use anyway; forcing interpret keeps it valid on a TPU backend.
    * hardware path (TPU backend only) — the real Mosaic kernel with the
      TPU hardware PRNG, whose bits no oracle can reproduce: deterministic
      replay, active-dropout, and a central-difference check of the
      custom-VJP gradients THROUGH the dropout branches (masks depend only
      on (seed, site), never on weights, so FD sees identical masks)."""
    from glow_tts_train_tpu.ops.encoder_pallas import encoder_layer_fused

    params, kw = _encoder(n_layers=1)
    layer0 = jax.tree_util.tree_map(lambda a: a[0], params)
    x, mask = _inputs()

    def run(key, p, q=None, interpret=None):
        return encoder_layer_fused(
            q if q is not None else layer0, x, mask, **kw, kernel_size=3,
            p_dropout=p, rng=key, deterministic=False, interpret=interpret,
        )

    y = run(jax.random.PRNGKey(5), 0.4)
    assert np.isfinite(np.asarray(y)).all()
    # same seed -> identical (deterministic replay, as backward needs)
    np.testing.assert_array_equal(
        np.asarray(run(jax.random.PRNGKey(5), 0.4)), np.asarray(y)
    )
    # different seed -> different masks (dropout is genuinely active)
    assert float(jnp.max(jnp.abs(run(jax.random.PRNGKey(6), 0.4) - y))) > 0

    # autodiff oracle: the kernel's own forward math is pure jnp — run it
    # outside Pallas with the same portable masks and jax.grad it; the
    # hand-written VJP must match exactly (incl. its dropout branches)
    from glow_tts_train_tpu.ops import encoder_pallas as ep
    from glow_tts_train_tpu.ops.wn_pallas import _offsets, portable_ops

    key = jax.random.PRNGKey(7)
    b = x.shape[0]
    thr = np.uint32(min(round(0.4 * 2 ** 32), 2 ** 32 - 1))
    st_tup = (2, 4, _offsets(3, 1), thr, 1.0 / 0.6)
    st = dict(ep._st_from_key(ep._EncKey(st_tup, True)), interpret=True)
    seed_f = jax.random.randint(
        key, (), minval=0, maxval=np.int32(2 ** 31 - 1), dtype=jnp.int32
    )
    mask_b = jnp.broadcast_to(mask, (b, x.shape[1], 1))

    def orc(q):
        refs = ep.fold_encoder_layer(q, jnp.float32)
        outs = []
        with portable_ops():
            for i in range(b):
                out, _ = ep._layer_fwd_math(
                    x[i], mask_b[i], refs, dict(st, seed=seed_f + i)
                )
                outs.append(out)
        return jnp.stack(outs)

    y_k = run(key, 0.4, interpret=True)
    y_o = orc(layer0)
    np.testing.assert_allclose(np.asarray(y_o), np.asarray(y_k), atol=1e-5)

    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal(y.shape), jnp.float32
    )
    g_k = jax.grad(
        lambda q: jnp.sum(run(key, 0.4, q=q, interpret=True) * cot)
    )(layer0)
    g_o = jax.grad(lambda q: jnp.sum(orc(q) * cot))(layer0)
    f_k, _ = fu.ravel_pytree(g_k)
    f_o, _ = fu.ravel_pytree(g_o)
    scale = float(jnp.max(jnp.abs(f_o)))
    np.testing.assert_allclose(
        np.asarray(f_k), np.asarray(f_o), atol=3e-6 * max(scale, 1.0)
    )

    # hardware path: FD oracle through the real Mosaic kernel (TPU PRNG)
    if jax.default_backend() == "tpu":
        fd_directional_grad_check(
            lambda q: jnp.sum(run(key, 0.4, q=q) * cot), layer0
        )


def test_encoder_fuse_auto_resolution():
    """config encoder_fuse="auto" follows the resolved wn_impl AND the
    kernel's supported encoder configuration."""
    from glow_tts_train_tpu.models import hyper_from_config
    from glow_tts_train_tpu.models.glow_tts import _resolve_encoder_fuse

    hp = hyper_from_config(tiny_config())  # CPU backend under tests
    assert hp.encoder_fuse is False

    m = tiny_config().model
    assert _resolve_encoder_fuse("auto", "pallas", m) is True
    assert _resolve_encoder_fuse("auto", "xla", m) is False
    m_nowin = tiny_config(window_size=None).model
    assert _resolve_encoder_fuse("auto", "pallas", m_nowin) is False
    m_blk = tiny_config(block_length=2).model
    assert _resolve_encoder_fuse("auto", "pallas", m_blk) is False
    assert _resolve_encoder_fuse(False, "pallas", m) is False  # explicit
    assert _resolve_encoder_fuse(True, "xla", m) is True


@pytest.mark.parametrize("pack", [2, 4])
def test_fused_encoder_sample_packing_matches(pack):
    """Sample packing (G samples per grid step, M=G·t matmuls) is
    numerically identical to pack=1 for outputs AND all parameter grads
    (dropout off; the dropout stream legitimately differs per pack)."""
    from glow_tts_train_tpu.ops import encoder_pallas as ep

    params, kw = _encoder()
    x, mask = _inputs(b=4, t=16)

    def loss(p):
        y = encoder_apply(
            p, x, mask, **kw, deterministic=True, fused=True
        )
        return jnp.sum(y * jnp.cos(y)), y

    with ep.force_pack(1):
        (_, y1), g1 = jax.value_and_grad(loss, has_aux=True)(params)
    with ep.force_pack(pack):
        (_, y2), g2 = jax.value_and_grad(loss, has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-5)
    f1, _ = fu.ravel_pytree(g1)
    f2, _ = fu.ravel_pytree(g2)
    scale = float(jnp.max(jnp.abs(f1)))
    np.testing.assert_allclose(
        np.asarray(f2), np.asarray(f1), atol=3e-6 * max(scale, 1.0)
    )


def test_fused_encoder_packed_dropout_oracle():
    """Packed in-kernel dropout: autodiff oracle at pack=2 — the kernel
    (interpret mode, portable PRNG) vs its own forward math run outside
    Pallas on the packed [G·t, h] layout with the same bits.  Pins the
    per-(segment, head) dropout site numbering that backward must replay
    (site = g·H + hd; packed sites at G·H + {0,1,2})."""
    from glow_tts_train_tpu.ops import encoder_pallas as ep
    from glow_tts_train_tpu.ops.encoder_pallas import encoder_layer_fused
    from glow_tts_train_tpu.ops.wn_pallas import _offsets, portable_ops

    params, kw = _encoder(n_layers=1)
    layer0 = jax.tree_util.tree_map(lambda a: a[0], params)
    x, mask = _inputs(b=4, t=16)
    b, t, h = x.shape
    G = 2

    def run(q):
        with ep.force_pack(G):
            return encoder_layer_fused(
                q, x, mask, **kw, kernel_size=3, p_dropout=0.4,
                rng=jax.random.PRNGKey(7), deterministic=False,
                interpret=True,
            )

    thr = np.uint32(min(round(0.4 * 2 ** 32), 2 ** 32 - 1))
    st_tup = (kw["n_heads"], kw["window_size"], _offsets(3, 1), thr,
              1.0 / 0.6)
    st = dict(
        ep._st_from_key(ep._EncKey(st_tup, True)),
        interpret=True, pack=G, n_sites=G * kw["n_heads"] + 3,
    )
    seed_f = jax.random.randint(
        jax.random.PRNGKey(7), (), minval=0, maxval=np.int32(2 ** 31 - 1),
        dtype=jnp.int32,
    )
    mask_b = jnp.broadcast_to(mask, (b, t, 1))
    xp = x.reshape(b // G, G * t, h)
    mp = mask_b.reshape(b // G, G * t, 1)

    def orc(q):
        refs = ep.fold_encoder_layer(q, jnp.float32)
        outs = []
        with portable_ops():
            for i in range(b // G):
                out, _ = ep._layer_fwd_math(
                    xp[i], mp[i], refs, dict(st, seed=seed_f + i)
                )
                outs.append(out)
        return jnp.stack(outs).reshape(b, t, h)

    y_k = run(layer0)
    y_o = orc(layer0)
    np.testing.assert_allclose(np.asarray(y_o), np.asarray(y_k), atol=1e-5)

    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal(y_k.shape), jnp.float32
    )
    g_k = jax.grad(lambda q: jnp.sum(run(q) * cot))(layer0)
    g_o = jax.grad(lambda q: jnp.sum(orc(q) * cot))(layer0)
    f_k, _ = fu.ravel_pytree(g_k)
    f_o, _ = fu.ravel_pytree(g_o)
    scale = float(jnp.max(jnp.abs(f_o)))
    np.testing.assert_allclose(
        np.asarray(f_k), np.asarray(f_o), atol=3e-6 * max(scale, 1.0)
    )
