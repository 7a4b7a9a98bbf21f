"""XLA-counted FLOPs for the real train step — the independent check of
the analytic accounting in utils/flops.py.

The analytic model is the numerator of every published MFU number
(bench.py), so it must not be self-certifying.  This module lowers the
actual jitted train step and reads XLA's own ``HloCostAnalysis`` flop
count from the lowered HLO, then reports it next to
``flops.training_flops`` as a ratio.

Two XLA-counting pitfalls are handled explicitly, and are why the count
is taken on a *counting configuration* rather than the production one:

* ``lax.scan``/``while`` bodies are visited ONCE by HloCostAnalysis
  regardless of trip count, so scanned encoder layers / flow blocks would
  undercount by the layer count.  The counting config forces
  ``unroll_blocks=True`` so every block's matmuls are real HLO ops.
* Pallas kernels are opaque custom-calls with no flop cost, so the
  counting config forces the pure-XLA op path (``wn_impl="xla"``,
  ``flow_block_fuse=False``, ``encoder_fuse=False``).  The Pallas kernels
  compute the same matmul math (tests/test_wn_pallas.py parity), so the
  XLA-path count is the right denominator-check for Pallas runs too.

Remaining known deltas (all make XLA >= analytic): XLA counts elementwise
and reduction flops the analytic model deliberately ignores
(flops.py:3-4), the optimizer update, the MAS scan body (once), and
transcendentals in losses.  A ratio meaningfully BELOW 1.0 would mean the
analytic model overcounts — exactly the failure the MFU claims need
guarding against.

``remat_blocks`` is forced to ``"none"`` so the lowered graph matches the
``3x forward`` accounting (``training_flops`` with ``hp.remat=False``);
the remat variant is a separate, additive term the analytic model guards
with the same flag.
"""

from __future__ import annotations

import dataclasses
import typing

COUNTING_OVERRIDES = {
    "unroll_blocks": True,
    "wn_impl": "xla",
    "flow_block_fuse": False,
    "flow_block_fuse_reverse": False,
    "encoder_fuse": False,
    "remat_blocks": False,
    "remat_encoder": False,
    "grad_accum_steps": 1,
    # threefry lowers everywhere; the rbg PRNG needs TPU hardware
    "prng_impl": "threefry2x32",
}


def counting_config(config):
    """A copy of ``config`` with every scan/Pallas knob pinned so XLA's
    cost analysis sees (and counts) the whole dataflow as plain HLO."""
    return dataclasses.replace(config, **COUNTING_OVERRIDES)


def xla_training_flops(
    config,
    b: int,
    t_x: int,
    t_y: int,
    mas_impl: str = "scan",
    compile_too: bool = False,
) -> typing.Dict[str, float]:
    """Lower the real train step at the given batch shape and return
    ``{"flops_xla", "flops_analytic", "ratio", ...}``.

    ``flops_xla`` is HloCostAnalysis over the PRE-optimization lowering —
    platform-neutral (CPU lowering gives the same module the bench's TPU
    step traces to, minus backend fusion) and cheap (no compile).  With
    ``compile_too`` the post-optimization count of the compiled executable
    is added as ``flops_xla_compiled`` (backend custom-call lowering may
    hide flops there; pre-opt is the primary number).
    """
    import jax
    import numpy as np

    from ..models import hyper_from_config
    from ..training import create_state, make_train_step
    from .flops import training_flops

    cfg = counting_config(config)
    hp = hyper_from_config(cfg)
    assert not hp.remat, "counting config must disable remat (3x accounting)"

    state = create_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(
        cfg, mesh=None, mas_impl=mas_impl, donate=False, jit=False
    )

    rng = np.random.default_rng(0)
    batch = {
        "x": jax.ShapeDtypeStruct((b, t_x), np.int32),
        "x_lengths": jax.ShapeDtypeStruct((b,), np.int32),
        "y": jax.ShapeDtypeStruct((b, t_y, cfg.audio.mel_channels), np.float32),
        "y_lengths": jax.ShapeDtypeStruct((b,), np.int32),
    }
    if cfg.model.n_speakers > 1:
        batch["speaker_ids"] = jax.ShapeDtypeStruct((b,), np.int32)
    del rng

    key = jax.random.key(1, impl=cfg.prng_impl)
    lowered = jax.jit(step_fn).lower(state, batch, key)
    cost = lowered.cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax: one entry per device
        cost = cost[0]
    flops_xla = float(cost.get("flops", float("nan")))

    analytic = training_flops(hp, b=b, t_x=t_x, t_y=t_y)
    out = {
        "b": b,
        "t_x": t_x,
        "t_y": t_y,
        "flops_xla": flops_xla,
        "flops_analytic": analytic,
        "ratio_analytic_over_xla": analytic / flops_xla if flops_xla else float("nan"),
    }
    if compile_too:
        ccost = lowered.compile().cost_analysis()
        if isinstance(ccost, (list, tuple)):
            ccost = ccost[0]
        out["flops_xla_compiled"] = float(ccost.get("flops", float("nan")))
    return out
