"""Monotonic Alignment Search (MAS) — fully on-device.

The reference implements MAS as a Cython/C kernel with a GPU→CPU→GPU
round-trip every training step (`monotonic_align/core.pyx:9-45`,
`monotonic_align/__init__.py:13-21`).  Here the same Viterbi-style dynamic
program runs on the TPU as a vectorized column scan:

* forward: ``lax.scan`` over mel frames y; each step updates the whole
  Q[:, :, y] column for all batch elements with VPU ops (the per-column
  recurrence Q[x,y] = logp[x,y] + max(Q[x,y-1], Q[x-1,y-1]) with the
  x<=y upper band enforced by masking, exactly the semantics of
  core.pyx:17-30 / utils.py:59-96)
* backtrace: reverse ``lax.scan`` over y carrying the per-sample row index,
  emitting one-hot path columns (core.pyx:32-35 semantics: move down iff
  index==y or Q[index,y-1] < Q[index-1,y-1]; ties stay)

Ragged (t_x_i, t_y_i) batches are handled by masking: the DP runs over the
padded rectangle, the backtrace starts at (t_x_i-1, t_y_i-1) and is gated on
y < t_y_i.  Out-of-band cells hold -1e9 and can never win a max.

A Pallas kernel variant (mas_pallas.py) fuses the whole DP in VMEM for lower
per-step overhead; this lax.scan version is the portable default and the
correctness oracle target (tests/test_mas.py checks both against a numpy
port of the core.pyx semantics).
"""

import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np

_MAX_NEG = -1e9


def maximum_path(
    logp: jnp.ndarray, mask: jnp.ndarray, impl: str = "scan"
) -> jnp.ndarray:
    """Find the best monotonic alignment path.

    logp: [b, t_x, t_y] pairwise log-likelihoods
    mask: [b, t_x, t_y] 0/1 attention mask (rectangular per sample)
    returns: [b, t_x, t_y] 0/1 path, dtype of logp

    API parity with reference monotonic_align/__init__.py:6-21 — but no host
    round-trip: everything stays on device.  MAS is non-differentiable by
    construction (the reference runs it under no_grad and detaches the path,
    models.py:362-382), so gradients are stopped at the inputs here — this
    also keeps autodiff from trying to JVP through the Pallas kernel.

    ``impl="auto"`` picks the faster implementation for the (static) shape
    from the measured per-device-kind crossover.  On v5e the Pallas kernel
    (single-kernel for VMEM-resident shapes, streaming two-pass otherwise —
    mas_pallas.py) wins at EVERY measured shape: 4.8-80x at small shapes
    where the scan's per-column dispatch overhead dominates, 2.5-5x at
    training/30s-utterance shapes (BASELINE.md round 3h), so auto is
    effectively always-pallas on TPU; non-TPU backends keep the scan for
    large shapes (interpret mode adds glue there).
    """
    logp = jax.lax.stop_gradient(logp)
    mask = jax.lax.stop_gradient(mask)
    if impl == "auto":
        impl = auto_impl(*logp.shape)
    if impl == "scan":
        return _maximum_path_scan(logp, mask)
    if impl == "pallas":
        from .mas_pallas import maximum_path_pallas

        return maximum_path_pallas(logp, mask)
    raise ValueError(f"unknown MAS impl: {impl}")


# Measured crossovers (cells = b*t_x*t_y) below which the Pallas kernel
# beats the column scan, keyed by jax device_kind.  Since the streaming
# variant landed (mas_pallas.py, BASELINE.md round 3h) the kernel wins at
# EVERY measured v5e shape — 3.9-5x at small/training shapes, 2.5-4.6x at
# b=192 and 30s-utterance shapes — so the v5e crossover is unbounded.
# Unknown TPU kinds still calibrate at first use.
_NO_CROSSOVER = 1 << 62
_PALLAS_MAX_CELLS_BY_KIND = {
    "TPU v5 lite": _NO_CROSSOVER,
}
# Non-TPU backends run the kernel in interpret mode (same XLA ops as the
# scan, plus padding/transpose glue for the streaming variant) — keep the
# scan above the old crossover there.
_DEFAULT_MAX_CELLS = 1_000_000
_calibrated_max_cells: typing.Dict[str, int] = {}

# two-point calibration probes: one in the overhead-dominated regime, one
# in the recurrence-bound regime (cells 131k / 2.6M on the v5e sweep grid)
_CALIBRATION_PROBES = ((8, 64, 256), (32, 128, 640))


def _pallas_max_cells() -> int:
    """Crossover for the attached device, resolved once per process.

    Known TPU kinds come from the measured table; an unknown TPU kind
    triggers a one-shot two-point timing calibration (cached per kind).
    Non-TPU backends keep the default: there the Pallas kernel runs in
    interpret mode, which jits to the same XLA loop as the scan, so the
    choice is performance-neutral and calibration would be noise.
    """
    if jax.default_backend() != "tpu":
        return _DEFAULT_MAX_CELLS
    kind = jax.devices()[0].device_kind
    if kind in _PALLAS_MAX_CELLS_BY_KIND:
        return _PALLAS_MAX_CELLS_BY_KIND[kind]
    if kind not in _calibrated_max_cells:
        _calibrated_max_cells[kind] = _calibrate_crossover()
        import logging

        logging.getLogger("glow_tts_train_tpu").info(
            "MAS auto crossover calibrated for %s: %s cells",
            kind,
            _calibrated_max_cells[kind],
        )
    return _calibrated_max_cells[kind]


def _time_impl(fn, logp, mask, iters: int = 8, repeats: int = 3) -> float:
    """Best wall time of an ``iters``-chained on-device run of ``fn``."""
    import time

    @jax.jit
    def chain(lp, m):
        def body(x, _):
            return x + fn(x, m) * 1e-6, None

        out, _ = jax.lax.scan(body, lp, None, length=iters)
        return out

    jax.block_until_ready(chain(logp, mask))  # compile
    best = float("inf")
    for _ in range(repeats):
        start = time.perf_counter()
        jax.block_until_ready(chain(logp, mask))
        best = min(best, time.perf_counter() - start)
    return best


def _crossover_from_times(
    small_cells: int,
    large_cells: int,
    scan_small: float,
    pallas_small: float,
    scan_large: float,
    pallas_large: float,
) -> int:
    """Crossover estimate from two-point timings: the kernel's win region
    is overhead-dominated small shapes, so the decision is which probes it
    wins, not a model fit."""
    wins_small = pallas_small < scan_small
    wins_large = pallas_large < scan_large
    if wins_small and wins_large:
        return 8 * large_cells  # kernel wins everywhere we can see
    if wins_small:
        return int((small_cells * large_cells) ** 0.5)  # between the probes
    return 0  # scan wins even the small probe


def _calibrate_crossover() -> int:
    from .mas_pallas import maximum_path_pallas

    rng = np.random.default_rng(0)
    times = []
    cells = []
    for b, t_x, t_y in _CALIBRATION_PROBES:
        logp = jnp.asarray(rng.standard_normal((b, t_x, t_y)), jnp.float32)
        mask = jnp.ones((b, t_x, t_y), jnp.float32)
        times.append(
            (
                _time_impl(_maximum_path_scan, logp, mask),
                _time_impl(maximum_path_pallas, logp, mask),
            )
        )
        cells.append(b * t_x * t_y)
    return _crossover_from_times(
        cells[0], cells[1], times[0][0], times[0][1], times[1][0], times[1][1]
    )


def auto_impl(b: int, t_x: int, t_y: int) -> str:
    """Implementation choice for a given static shape (see maximum_path).

    The Pallas dispatch handles every shape (single-kernel when logp fits
    VMEM, streaming otherwise), so the choice is purely the measured
    crossover for the attached device kind."""
    return "scan" if b * t_x * t_y > _pallas_max_cells() else "pallas"


@jax.jit
def _maximum_path_scan(logp: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    dtype = logp.dtype
    b, t_x, t_y = logp.shape
    maskf = mask.astype(jnp.float32)
    value = logp.astype(jnp.float32) * maskf  # zero padding region, like ref

    t_x_len = jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32)  # [b]
    t_y_len = jnp.sum(mask[:, 0, :], axis=1).astype(jnp.int32)  # [b]

    x_range = jnp.arange(t_x, dtype=jnp.int32)[None, :]  # [1, t_x]

    # ---- forward DP over columns ----
    def fwd(carry, logp_col):
        v, y = carry  # v: [b, t_x] = Q[:, :, y-1]
        # v0[x] = Q[x-1, y-1] (shift right, -inf at x=0)
        v0 = jnp.concatenate(
            [jnp.full((b, 1), _MAX_NEG, jnp.float32), v[:, :-1]], axis=1
        )
        stay = v >= v0  # ties stay (core.pyx:34 uses strict < to move)
        v_max = jnp.where(stay, v, v0)
        v_new = jnp.where(x_range <= y, v_max + logp_col, _MAX_NEG)
        return (v_new, y + 1), stay

    # iterate columns: xs = value transposed to [t_y, b, t_x]
    v0 = jnp.zeros((b, t_x), jnp.float32)
    (_, _), direction = jax.lax.scan(
        fwd, (v0, jnp.int32(0)), value.transpose(2, 0, 1)
    )
    # direction: [t_y, b, t_x] bool; True = stay. Outside the mask force
    # "stay" (reference utils.py:86: direction = where(mask, direction, 1)).
    direction = jnp.where(mask.transpose(2, 0, 1), direction, True)

    # ---- backtrace ----
    y_range = jnp.arange(t_y, dtype=jnp.int32)

    def bwd(index, inp):
        dir_col, y = inp  # dir_col: [b, t_x]
        active = y < t_y_len  # [b]
        path_col = (x_range[0][None, :] == index[:, None]) & active[:, None]
        d = jnp.take_along_axis(
            dir_col.astype(jnp.int32), index[:, None], axis=1
        )[:, 0]
        # explicit overrides, matching core.pyx:34 exactly: at index==0 never
        # move down; at index==y always move down.  The recorded direction at
        # those cells compares against the -1e9 out-of-band sentinel, which
        # real Q values can undercut for extreme log-likelihoods.
        d = jnp.where(index == 0, 1, jnp.where(index == y, 0, d))
        index_new = jnp.where(active, jnp.maximum(index + d - 1, 0), index)
        return index_new, path_col

    init_index = jnp.maximum(t_x_len - 1, 0)
    _, path_cols = jax.lax.scan(
        bwd, init_index, (direction, y_range), reverse=True
    )
    # path_cols: [t_y, b, t_x] -> [b, t_x, t_y]
    path = path_cols.transpose(1, 2, 0).astype(dtype)
    return path * mask.astype(dtype)


def maximum_path_numpy(
    value: np.ndarray,
    mask: np.ndarray,
    max_neg_val: float = -1e9,
) -> np.ndarray:
    """Reference-semantics numpy oracle (direct port of the core.pyx DP,
    including the in-place banded update and the strict-inequality
    backtrace).  Used for testing and as a host-side fallback."""
    value = (value * mask).astype(np.float32).copy()
    b, t_x, t_y = value.shape
    paths = np.zeros_like(value, dtype=np.int32)
    t_xs = mask.sum(1)[:, 0].astype(np.int32)
    t_ys = mask.sum(2)[:, 0].astype(np.int32)
    for i in range(b):
        _maximum_path_each_numpy(paths[i], value[i], t_xs[i], t_ys[i], max_neg_val)
    return paths.astype(value.dtype) * mask


def _maximum_path_each_numpy(path, value, t_x, t_y, max_neg_val):
    """Single-sample DP, semantics of core.pyx:9-35."""
    index = t_x - 1
    for y in range(t_y):
        for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
            v_cur = max_neg_val if x == y else value[x, y - 1]
            if x == 0:
                v_prev = 0.0 if y == 0 else max_neg_val
            else:
                v_prev = value[x - 1, y - 1]
            value[x, y] = max(v_cur, v_prev) + value[x, y]
    for y in range(t_y - 1, -1, -1):
        path[index, y] = 1
        if index != 0 and (index == y or value[index, y - 1] < value[index - 1, y - 1]):
            index = index - 1
