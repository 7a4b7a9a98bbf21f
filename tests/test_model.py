"""Model graph tests: shapes, finiteness, training-step learning, DDI,
generation determinism, and multispeaker conditioning."""

import numpy as np

import jax
import jax.numpy as jnp

from glow_tts_train_tpu import training
from glow_tts_train_tpu.models import (
    forward_gen,
    forward_train,
    hyper_from_config,
    init_model,
)

from helpers import random_batch, tiny_config


def test_forward_train_shapes_and_losses():
    config = tiny_config()
    hp = hyper_from_config(config)
    params = init_model(jax.random.PRNGKey(0), hp)
    batch = random_batch(config, np.random.default_rng(0))

    (z, z_m, z_logs, logdet, z_mask), (x_m, x_logs, x_mask), (attn, logw, logw_) = (
        forward_train(
            params,
            hp,
            jnp.asarray(batch["x"]),
            jnp.asarray(batch["x_lengths"]),
            jnp.asarray(batch["y"]),
            jnp.asarray(batch["y_lengths"]),
        )
    )

    b, t_x = batch["x"].shape
    t_y = (batch["y"].shape[1] // 2) * 2
    n_mel = config.audio.mel_channels
    assert z.shape == (b, t_y, n_mel)
    assert z_m.shape == (b, t_y, n_mel)
    assert logdet.shape == (b,)
    assert attn.shape == (b, t_x, t_y)
    assert logw.shape == (b, t_x, 1)
    for a in (z, z_m, z_logs, logdet, logw, logw_):
        assert np.isfinite(np.asarray(a)).all()

    # attn rows: every unpadded frame assigned exactly one phoneme
    attn_np = np.asarray(attn)
    y_len = (np.asarray(batch["y_lengths"]) // 2) * 2
    for i in range(b):
        np.testing.assert_array_equal(
            attn_np[i, :, : y_len[i]].sum(0), np.ones(y_len[i])
        )
        assert attn_np[i, :, y_len[i]:].sum() == 0


def test_train_step_reduces_loss():
    config = tiny_config()
    config.warmup_steps = 10  # reach a useful lr within the test budget
    state = training.create_state(config, jax.random.PRNGKey(0))
    step_fn = training.make_train_step(config, donate=False)
    batch = random_batch(config, np.random.default_rng(1))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    def eval_loss(params):
        from glow_tts_train_tpu.models import (
            duration_loss,
            forward_train,
            hyper_from_config,
            mle_loss,
        )

        hp = hyper_from_config(config)
        (z, z_m, z_logs, logdet, z_mask), _, (_, logw, logw_) = forward_train(
            params, hp, batch["x"], batch["x_lengths"], batch["y"],
            batch["y_lengths"], deterministic=True,
        )
        return float(
            mle_loss(z, z_m, z_logs, logdet, z_mask)
            + duration_loss(logw, logw_, batch["x_lengths"])
        )

    before = eval_loss(state.params)
    for i in range(25):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"]))
    after = eval_loss(state.params)
    assert after < before, (before, after)
    assert float(metrics["grad_norm"]) >= 0
    assert int(state.step) == 26


def test_ddi_initializes_first_actnorm():
    config = tiny_config()
    batch = random_batch(config, np.random.default_rng(2))
    # scale mels so fresh actnorm (identity) would NOT be normalized
    batch["y"] = batch["y"] * 5.0 + 2.0
    params = training.initialize_model(config, batch)
    # first block's actnorm should now normalize its input
    from glow_tts_train_tpu.ops import flows

    hp = hyper_from_config(config)
    y = jnp.asarray(batch["y"][:, : (batch["y"].shape[1] // 2) * 2])
    y_lengths = (jnp.asarray(batch["y_lengths"]) // 2) * 2
    from glow_tts_train_tpu.ops.masks import time_mask

    mask = time_mask(y_lengths, y.shape[1], jnp.float32)
    x_sq, m_sq = flows.squeeze(y, mask, 2)
    an0 = jax.tree_util.tree_map(lambda a: a[0], params["decoder"]["blocks"]["actnorm"])
    z, _ = flows.actnorm_fwd(an0, x_sq, m_sq)
    zf, mf = np.asarray(z), np.asarray(m_sq)
    mean = (zf * mf).sum((0, 1)) / mf.sum()
    var = (zf ** 2 * mf).sum((0, 1)) / mf.sum() - mean ** 2
    np.testing.assert_allclose(mean, 0, atol=1e-4)
    np.testing.assert_allclose(var, 1, atol=1e-3)


def test_forward_gen_deterministic_and_masked():
    config = tiny_config()
    hp = hyper_from_config(config)
    params = init_model(jax.random.PRNGKey(3), hp)
    b, t_x = 2, 9
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(1, 20, size=(b, t_x)), jnp.int32)
    x_lengths = jnp.asarray([t_x, t_x - 3], jnp.int32)

    out1 = forward_gen(
        params, hp, x, x_lengths, y_max_length=64,
        noise_rng=jax.random.PRNGKey(0), noise_scale=0.0,
    )
    out2 = forward_gen(
        params, hp, x, x_lengths, y_max_length=64,
        noise_rng=jax.random.PRNGKey(99), noise_scale=0.0,
    )
    (y1, _, _, z_mask), _, _, y_lengths = out1
    y2 = out2[0][0]
    # noise_scale=0 → deterministic regardless of noise rng
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
    # output masked beyond y_lengths
    y_np = np.asarray(y1)
    for i in range(b):
        assert np.all(y_np[i, int(y_lengths[i]):] == 0)
    assert int(y_lengths.max()) <= 64

    # length_scale stretches durations
    _, _, _, y_len_stretched = forward_gen(
        params, hp, x, x_lengths, y_max_length=128,
        noise_rng=jax.random.PRNGKey(0), noise_scale=0.0, length_scale=2.0,
    )
    assert int(y_len_stretched[0]) >= int(y_lengths[0])


def test_multispeaker_conditioning():
    config = tiny_config(n_speakers=3, gin_channels=4)
    hp = hyper_from_config(config)
    params = init_model(jax.random.PRNGKey(4), hp)
    assert "emb_g" in params
    b, t_x = 2, 7
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(1, 20, size=(b, t_x)), jnp.int32)
    x_lengths = jnp.asarray([t_x, t_x], jnp.int32)

    def gen(speaker):
        out = forward_gen(
            params, hp, x, x_lengths, y_max_length=64,
            noise_rng=jax.random.PRNGKey(0), noise_scale=0.0,
            g_ids=jnp.asarray([speaker, speaker], jnp.int32),
        )
        return np.asarray(out[0][0])

    assert not np.allclose(gen(0), gen(1))

    # multispeaker training step runs
    state = training.create_state(config, jax.random.PRNGKey(5))
    step_fn = training.make_train_step(config, donate=False)
    batch = random_batch(config, np.random.default_rng(5), multispeaker=True)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_dilated_wn_and_no_squeeze_config():
    """dilation_rate>1 (per-layer WN dilations) and n_sqz=1 (no time folding)
    both train and stay invertible."""
    config = tiny_config(dilation_rate=2, n_sqz=1)
    hp = hyper_from_config(config)
    params = init_model(jax.random.PRNGKey(9), hp)
    batch = random_batch(config, np.random.default_rng(9))

    (z, _, _, logdet, z_mask), _, _ = forward_train(
        params, hp,
        jnp.asarray(batch["x"]), jnp.asarray(batch["x_lengths"]),
        jnp.asarray(batch["y"]), jnp.asarray(batch["y_lengths"]),
        deterministic=True,
    )
    assert np.isfinite(np.asarray(z)).all()
    assert np.isfinite(np.asarray(logdet)).all()
    # n_sqz=1: no frame truncation
    assert z.shape[1] == batch["y"].shape[1]

    # decoder roundtrip under this config
    from glow_tts_train_tpu.ops import flows

    x_rec, _ = flows.decoder_inv(params["decoder"], z, z_mask, hp.decoder)
    y_masked = jnp.asarray(batch["y"]) * z_mask
    np.testing.assert_allclose(
        np.asarray(x_rec), np.asarray(y_masked), atol=2e-4
    )

    # one training step runs
    state = training.create_state(config, jax.random.PRNGKey(0))
    step_fn = training.make_train_step(config, donate=False)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    _, metrics = step_fn(state, jb, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_padding_bucket_invariance():
    """The same utterance padded into different static buckets must produce
    the same mel — masks make padding invisible end-to-end (the contract the
    bucketed infer pipeline relies on)."""
    config = tiny_config()
    hp = hyper_from_config(config)
    params = init_model(jax.random.PRNGKey(11), hp)
    rng = np.random.default_rng(11)
    ids = rng.integers(1, 20, size=7).astype(np.int32)

    def gen(t_pad, y_max):
        x = np.zeros((1, t_pad), np.int32)
        x[0, :7] = ids
        out = forward_gen(
            params, hp, jnp.asarray(x), jnp.asarray([7], jnp.int32),
            y_max_length=y_max, noise_rng=jax.random.PRNGKey(0), noise_scale=0.0,
        )
        y, y_lengths = out[0][0], out[3]
        return np.asarray(y)[0, : int(y_lengths[0])]

    mel_a = gen(t_pad=8, y_max=48)
    mel_b = gen(t_pad=24, y_max=96)
    assert mel_a.shape == mel_b.shape
    np.testing.assert_allclose(mel_a, mel_b, atol=2e-4)
