"""Shared test fixtures: a tiny Glow-TTS config and random batches."""

import numpy as np

from glow_tts_train_tpu.config import AudioConfig, ModelConfig, TrainingConfig


def fd_directional_grad_check(
    loss_fn, params, n_dirs=3, eps_ladder=(3e-2, 1e-2, 3e-3, 1e-3),
    rtol=2.5e-2, seed=0,
):
    """Central-difference check of a custom-VJP gradient on the REAL kernel
    path (usable where an autodiff oracle cannot run, e.g. the TPU hardware
    PRNG: dropout masks depend only on (seed, site), never on weights, so
    both FD evaluations see identical masks and the difference quotient is
    exact up to curvature).  ``loss_fn`` must be deterministic given params.

    Directions are the normalized gradient itself plus gradient+noise
    mixes — along a RANDOM direction the analytic derivative is only
    ~|g|/sqrt(n_params), drowned by FD noise (fp32 loss round-off/2eps +
    ReLU kink crossings, measured ~0.05-0.15 absolute on v5e at these
    scales), while along the gradient the signal is |g| itself.  A real
    backward bug (wrong PRNG replay between forward and backward, missing
    term, sign) misdirects a macroscopic fraction of the gradient mass and
    fails the relative check at every eps; any eps in the ladder may pass.
    """
    import jax
    import jax.flatten_util as fu
    import jax.numpy as jnp

    flat_p, unravel = fu.ravel_pytree(params)
    g = jax.grad(loss_fn)(params)
    flat_g, _ = fu.ravel_pytree(g)
    gdir = np.asarray(flat_g, np.float64)
    gnorm = np.linalg.norm(gdir)
    assert gnorm > 0.0, "zero gradient — nothing to check"
    gdir /= gnorm
    rng = np.random.default_rng(seed)
    for i in range(n_dirs):
        if i == 0:
            d = gdir
        else:
            r = rng.standard_normal(flat_p.shape)
            r /= np.linalg.norm(r)
            d = gdir + r
            d /= np.linalg.norm(d)
        dj = jnp.asarray(d.astype(np.float32))
        analytic = float(flat_g @ dj)
        tol = rtol * max(abs(analytic), 1e-3 * gnorm)
        errs = []
        for eps in eps_ladder:
            lp = float(loss_fn(unravel(flat_p + eps * dj)))
            lm = float(loss_fn(unravel(flat_p - eps * dj)))
            errs.append((lp - lm) / (2 * eps) - analytic)
            if abs(errs[-1]) <= tol:
                break
        else:
            raise AssertionError(
                f"direction {i}: analytic {analytic:.6f}, FD errors "
                f"{[f'{e:+.6f}' for e in errs]} all exceed tol {tol:.6f}"
            )


def tiny_config(**model_overrides) -> TrainingConfig:
    model = ModelConfig(
        num_symbols=20,
        hidden_channels=16,
        filter_channels=32,
        filter_channels_dp=16,
        kernel_size=3,
        p_dropout=0.1,
        n_blocks_dec=2,
        n_layers_enc=2,
        n_heads=2,
        p_dropout_dec=0.05,
        dilation_rate=1,
        kernel_size_dec=5,
        n_block_layers=2,
        n_sqz=2,
        prenet=True,
        mean_only=True,
        hidden_channels_enc=16,
        hidden_channels_dec=16,
        window_size=4,
        n_speakers=1,
        n_split=4,
    )
    for k, v in model_overrides.items():
        setattr(model, k, v)
    audio = AudioConfig(mel_channels=8)
    return TrainingConfig(
        model=model,
        audio=audio,
        batch_size=4,
        bucket_size_text=1,
        bucket_size_mel=1,
    )


def random_batch(config, rng, b=4, t_x=11, t_y=26, multispeaker=False):
    x = rng.integers(1, config.model.num_symbols, size=(b, t_x)).astype(np.int32)
    x_lengths = rng.integers(max(2, t_x - 4), t_x + 1, size=b).astype(np.int32)
    x_lengths[0] = t_x
    for i in range(b):
        x[i, x_lengths[i]:] = 0
    y_lengths = rng.integers(max(4, t_y - 9), t_y + 1, size=b).astype(np.int32)
    y_lengths[0] = t_y
    y_lengths = np.maximum(y_lengths, 2 * x_lengths)  # need t_y >= t_x after n_sqz
    t_y = int(y_lengths.max())
    y = rng.standard_normal((b, t_y, config.audio.mel_channels)).astype(np.float32)
    for i in range(b):
        y[i, y_lengths[i]:] = 0.0
    batch = {
        "x": x,
        "x_lengths": x_lengths,
        "y": y,
        "y_lengths": y_lengths,
    }
    if multispeaker:
        batch["speaker_ids"] = rng.integers(
            0, config.model.n_speakers, size=b
        ).astype(np.int32)
    return batch
