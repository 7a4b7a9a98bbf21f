"""Gradient accumulation (config.grad_accum_steps).

The accumulation is designed to be EXACT, not approximate: both losses
are num/den ratios whose denominators are pure functions of the batch
lengths, so each microbatch's numerators are re-weighted against the
whole-batch denominators and the scanned gradient sum equals the
full-batch gradient to float round-off — including on RAGGED batches
where naive microbatch-loss averaging would diverge (the per-microbatch
frame counts differ).
"""

import dataclasses

import jax
import numpy as np
import pytest

from glow_tts_train_tpu import training

from helpers import random_batch, tiny_config


def _config(**over):
    config = tiny_config(p_dropout=0.0, p_dropout_dec=0.0)
    for k, v in over.items():
        setattr(config, k, v)
    return config


@pytest.mark.parametrize("accum", [2, 4])
def test_accumulated_step_matches_full_batch(accum):
    config = _config()
    # ragged lengths: per-microbatch denominators genuinely differ
    batch = random_batch(config, np.random.default_rng(1), b=8)
    assert len(set(batch["y_lengths"].tolist())) > 1
    state = training.create_state(config, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(3)

    full_step = training.make_train_step(config, donate=False)
    full_state, full_metrics = full_step(state, batch, rng)

    config_a = dataclasses.replace(config, grad_accum_steps=accum)
    state_a = training.create_state(config_a, jax.random.PRNGKey(0))
    accum_step = training.make_train_step(config_a, donate=False)
    accum_state, accum_metrics = accum_step(state_a, batch, rng)

    # f32 reduction order differs (per-microbatch partial sums vs one
    # whole-batch reduction) — "exact" means equal to round-off, not bit
    for key in ("loss", "mle_loss", "duration_loss", "grad_norm"):
        np.testing.assert_allclose(
            float(accum_metrics[key]), float(full_metrics[key]),
            rtol=3e-4, atol=1e-6, err_msg=key,
        )
    for (pa, la), (_, lb) in zip(
        jax.tree_util.tree_leaves_with_path(accum_state.params),
        jax.tree_util.tree_leaves_with_path(full_state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=3e-4, atol=2e-6,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_indivisible_batch_rejected():
    config = _config(grad_accum_steps=3)
    batch = random_batch(config, np.random.default_rng(2), b=8)
    state = training.create_state(config, jax.random.PRNGKey(0))
    step = training.make_train_step(config, donate=False)
    with pytest.raises(AssertionError, match="grad_accum_steps"):
        step(state, batch, jax.random.PRNGKey(0))


def test_accum_under_mesh_matches_meshless():
    """accum=2 on the 8-device mesh: the (accum, mb, ...) reshape of the
    data-sharded batch must compile (GSPMD reshards), and the result must
    match the meshless accumulated step."""
    from jax.sharding import Mesh

    from glow_tts_train_tpu.parallel import shard_batch

    config = _config(grad_accum_steps=2)
    config.batch_size = 8
    batch = random_batch(config, np.random.default_rng(6), b=8)
    state = training.create_state(config, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(5)

    ref_step = training.make_train_step(config, donate=False)
    _, ref_metrics = ref_step(state, batch, rng)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    state2 = training.create_state(config, jax.random.PRNGKey(0))
    step = training.make_train_step(config, mesh=mesh, donate=False)
    _, metrics = step(state2, shard_batch(batch, mesh, config.mesh_axis), rng)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=3e-4
    )


def test_accum_with_dropout_trains():
    """Dropout draws a distinct stream per microbatch — not comparable to
    the full-batch step, but the step must run and produce finite loss."""
    config = tiny_config()  # dropout on
    config.grad_accum_steps = 2
    batch = random_batch(config, np.random.default_rng(4), b=4)
    state = training.create_state(config, jax.random.PRNGKey(0))
    step = training.make_train_step(config, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
