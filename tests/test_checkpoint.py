"""Checkpoint round-trip + tolerant-merge tests (reference checkpoint.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from glow_tts_train_tpu import training
from glow_tts_train_tpu.checkpoint import Checkpoint, load_checkpoint, save_checkpoint
from glow_tts_train_tpu.models import hyper_from_config, init_model

from helpers import tiny_config


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)


def test_checkpoint_roundtrip(tmp_path):
    config = tiny_config()
    state = training.create_state(config, jax.random.PRNGKey(0), global_step=41)
    path = tmp_path / "checkpoint_41.npz"
    save_checkpoint(
        Checkpoint(
            params=state.params,
            opt_state=state.opt_state,
            learning_rate=0.00123,
            global_step=41,
            version=1,
        ),
        path,
    )
    loaded = load_checkpoint(path, config)
    assert loaded.global_step == 41
    assert abs(loaded.learning_rate - 0.00123) < 1e-9
    assert loaded.version == 1
    _tree_equal(loaded.params, state.params)
    _tree_equal(loaded.opt_state, state.opt_state)


def test_tolerant_merge_missing_keys(tmp_path, caplog):
    """Keys missing from the checkpoint keep fresh-init values with a warning
    (reference checkpoint.py:84-93 — enables new-layer fine-tuning)."""
    config = tiny_config()
    state = training.create_state(config, jax.random.PRNGKey(0))
    path = tmp_path / "ckpt.npz"
    save_checkpoint(
        Checkpoint(state.params, 1.0, 1, 1, opt_state=None), path
    )

    # widen the model: add speakers → emb_g is new
    config2 = tiny_config(n_speakers=3, gin_channels=4)
    import logging

    with caplog.at_level(logging.WARNING):
        loaded = load_checkpoint(path, config2, load_optimizer=False)
    assert "emb_g" in loaded.params
    assert any("not in the checkpoint" in r.message for r in caplog.records)
    # shared keys restored exactly
    np.testing.assert_allclose(
        np.asarray(loaded.params["emb"]), np.asarray(state.params["emb"])
    )


def test_resume_continues_training(tmp_path):
    """Save mid-training, reload, keep stepping — optimizer state including
    the Noam schedule count must survive."""
    config = tiny_config()
    config.warmup_steps = 10
    state = training.create_state(config, jax.random.PRNGKey(0))
    step_fn = training.make_train_step(config, donate=False)

    from helpers import random_batch

    batch = {k: jnp.asarray(v) for k, v in random_batch(config, np.random.default_rng(0)).items()}
    for i in range(3):
        state, _ = step_fn(state, batch, jax.random.PRNGKey(i))

    path = tmp_path / "ckpt.npz"
    save_checkpoint(
        Checkpoint(state.params, 1.0, int(state.step), 1, opt_state=state.opt_state),
        path,
    )
    loaded = load_checkpoint(path, config)
    state2 = training.TrainState(
        loaded.params, loaded.opt_state, jnp.asarray(loaded.global_step, jnp.int32)
    )
    state2, metrics = step_fn(state2, batch, jax.random.PRNGKey(10))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 5


def test_opt_restore_refuses_changed_optimizer(tmp_path, caplog, monkeypatch):
    """A checkpoint saved with one optax chain must NOT positionally load
    into a different chain — the fingerprint refuses and the whole saved
    optimizer state is discarded with a warning."""
    import logging

    import optax

    from glow_tts_train_tpu import checkpoint as ckpt_mod

    config = tiny_config()
    state = training.create_state(config, jax.random.PRNGKey(0))
    path = tmp_path / "ckpt.npz"
    save_checkpoint(
        Checkpoint(state.params, 1.0, 3, 1, opt_state=state.opt_state), path
    )

    # same leaf shapes, different transform order — positional zip would
    # silently swap adam's mu/nu slots with the trace slot
    def reordered_optimizer(config):
        return optax.chain(
            optax.trace(decay=0.9),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(1e-3),
        )

    monkeypatch.setattr(ckpt_mod, "make_optimizer", reordered_optimizer)
    with caplog.at_level(logging.WARNING):
        loaded = load_checkpoint(path, config)
    assert any(
        "discarding saved optimizer state" in r.message for r in caplog.records
    )
    # the returned state is the FRESH one for the new chain (count == 0)
    fresh = reordered_optimizer(config).init(loaded.params)
    assert jax.tree_util.tree_structure(loaded.opt_state) == (
        jax.tree_util.tree_structure(fresh)
    )


def test_opt_restore_all_or_nothing_on_shape_change(tmp_path, caplog):
    """If any opt leaf shape mismatches (e.g. model resize), the WHOLE saved
    optimizer state is discarded — never restored-mu + fresh-nu."""
    import logging

    config = tiny_config()
    state = training.create_state(config, jax.random.PRNGKey(0))
    path = tmp_path / "ckpt.npz"
    save_checkpoint(
        Checkpoint(state.params, 1.0, 3, 1, opt_state=state.opt_state), path
    )

    config2 = tiny_config(n_speakers=3, gin_channels=4)  # more params
    with caplog.at_level(logging.WARNING):
        loaded = load_checkpoint(path, config2)
    assert any(
        "discarding saved optimizer state" in r.message for r in caplog.records
    )
    # fresh adam state: count is zero
    counts = [
        np.asarray(leaf)
        for path_, leaf in jax.tree_util.tree_flatten_with_path(
            loaded.opt_state
        )[0]
        if "count" in "/".join(str(p) for p in path_)
    ]
    assert counts and all(int(c) == 0 for c in counts)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """.orbax directory checkpoints round-trip params, optimizer state, and
    metadata (the pod-scale format)."""
    import pytest

    pytest.importorskip("orbax.checkpoint")
    config = tiny_config()
    state = training.create_state(config, jax.random.PRNGKey(0), global_step=13)
    path = tmp_path / "checkpoint_13.orbax"
    save_checkpoint(
        Checkpoint(
            params=state.params,
            opt_state=state.opt_state,
            learning_rate=0.005,
            global_step=13,
            version=1,
        ),
        path,
    )
    assert path.is_dir()
    loaded = load_checkpoint(path, config)
    assert loaded.global_step == 13
    assert abs(loaded.learning_rate - 0.005) < 1e-9
    _tree_equal(loaded.params, state.params)
    _tree_equal(loaded.opt_state, state.opt_state)


def test_legacy_flat_opt_state_migrates(tmp_path, caplog):
    """Checkpoints written before the round-2 optimizer-form switch hold
    Adam state over ONE raveled fp32 vector; loading them must unravel the
    moments onto the param tree (same ravel order) instead of discarding
    them — a silent Adam/schedule restart mid-run regresses training."""
    import logging

    import jax.flatten_util
    import optax

    from glow_tts_train_tpu.optimize import make_optimizer
    from glow_tts_train_tpu.training import create_state

    config = tiny_config()
    state = create_state(config, jax.random.PRNGKey(0))
    tx = make_optimizer(config)

    # simulate the legacy form: optimizer state over the flat vector, with
    # recognizable moment values and a non-zero schedule count
    flat, unravel = jax.flatten_util.ravel_pytree(state.params)
    legacy = tx.init(flat)
    legacy = jax.tree_util.tree_map(jnp.asarray, legacy)
    rng = np.random.default_rng(3)
    mu = rng.standard_normal(flat.shape[0]).astype(np.float32)
    nu = np.abs(rng.standard_normal(flat.shape[0])).astype(np.float32)
    legacy = (
        legacy[0],
        legacy[1]._replace(
            count=jnp.asarray(123, jnp.int32),
            mu=jnp.asarray(mu),
            nu=jnp.asarray(nu),
        ),
        legacy[2]._replace(count=jnp.asarray(123, jnp.int32)),
    )

    path = tmp_path / "legacy.npz"
    save_checkpoint(
        Checkpoint(
            params=state.params,
            opt_state=legacy,
            learning_rate=1e-4,
            global_step=124,
            version=1,
        ),
        path,
    )

    with caplog.at_level(logging.INFO):
        loaded = load_checkpoint(path, config)
    assert any("migrated legacy flat-vector" in r.message for r in caplog.records)

    # moments landed on the tree in ravel order; counts preserved
    assert int(loaded.opt_state[1].count) == 123
    assert int(loaded.opt_state[2].count) == 123
    mu_flat = jax.flatten_util.ravel_pytree(loaded.opt_state[1].mu)[0]
    nu_flat = jax.flatten_util.ravel_pytree(loaded.opt_state[1].nu)[0]
    np.testing.assert_allclose(np.asarray(mu_flat), mu, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(nu_flat), nu, rtol=1e-6)
