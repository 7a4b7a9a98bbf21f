"""Pallas TPU kernel for Monotonic Alignment Search.

The lax.scan MAS (ops/mas.py) dispatches one XLA loop step per mel frame —
correct everywhere, but each step is a handful of tiny VPU ops with loop
overhead around them.  This kernel fuses the entire DP (forward column
recurrence + backtrace) into ONE kernel: logp lives in VMEM, the column
state is a register vector, and the sequential loops are in-kernel
`fori_loop`s with zero dispatch overhead.

Layout: work is tiled over batch chunks (grid over b/CHUNK); inside a chunk
the DP state is [CHUNK, t_x] — CHUNK rides sublanes, t_x rides lanes, so the
per-column update is a few full-width VPU ops.  The chunk size is chosen so
logp + direction fit in VMEM.

Semantics are identical to ops/mas.py (reference core.pyx:9-45): ties stay,
move-down iff index==y or Q[index,y-1] < Q[index-1,y-1], per-sample ragged
(t_x_i, t_y_i) handled by masking.  Verified against the same oracle in
tests/test_mas.py.
"""

import functools
import typing

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_NEG = -1e9
_VMEM_BUDGET = 10 * 1024 * 1024  # bytes for logp + direction blocks


def _kernel(logp_ref, txl_ref, tyl_ref, path_ref, v_ref, dir_ref):
    # logp_ref/path_ref/dir_ref layout: [t_y, chunk, t_x] — y is the MAJOR
    # dim so every per-column access is one contiguous [chunk, t_x] tile
    # (dynamic slicing a middle dim would cross pages each iteration)
    t_y, chunk, t_x = logp_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, t_x), 1)
    txl = txl_ref[:]  # [chunk, 1] int32
    tyl = tyl_ref[:]  # [chunk, 1] int32
    # f32 masks instead of i1 vectors: Mosaic rejects some bool-vector
    # stores/broadcasts ("unsupported target bitwidth for truncation")
    in_tx = jnp.where(lane < txl, 1.0, 0.0)  # [chunk, t_x]

    # ---- forward DP over columns ----
    v_ref[:] = jnp.zeros((chunk, t_x), jnp.float32)

    def fwd(y, _):
        v = v_ref[:]
        row = logp_ref[y, :, :]  # [chunk, t_x]
        v0 = pltpu.roll(v, shift=1, axis=1)
        v0 = jnp.where(lane == 0, _MAX_NEG, v0)
        stay = jnp.where(v >= v0, 1.0, 0.0)  # f32 0/1
        v_max = jnp.maximum(v, v0)
        v_ref[:] = jnp.where(lane <= y, v_max + row, _MAX_NEG)
        # outside each sample's t_x force "stay" (ref utils.py:86)
        dir_ref[y, :, :] = stay * in_tx + (1.0 - in_tx)
        return 0

    jax.lax.fori_loop(0, t_y, fwd, 0)

    # ---- backtrace ----
    path_ref[:] = jnp.zeros((t_y, chunk, t_x), jnp.float32)
    index0 = jnp.maximum(txl - 1, 0)  # [chunk, 1]

    def bwd(k, index):
        y = t_y - 1 - k
        active = jnp.where(y < tyl, 1.0, 0.0)  # [chunk, 1] f32
        onehot = jnp.where(lane == index, 1.0, 0.0)  # [chunk, t_x] f32
        path_ref[y, :, :] = active * onehot
        d = jnp.sum(onehot * dir_ref[y, :, :], axis=1, keepdims=True)
        d = d.astype(jnp.int32)
        # explicit index==0 (stay) / index==y (move) overrides — the stored
        # direction at those cells compared against the -1e9 sentinel (see
        # ops/mas.py bwd)
        d = jnp.where(index == 0, 1, jnp.where(index == y, 0, d))
        step = jnp.maximum(index + d - 1, 0)
        return jnp.where(y < tyl, step, index)

    jax.lax.fori_loop(0, t_y, bwd, index0)


def _pick_chunk(b: int, t_x: int, t_y: int) -> typing.Optional[int]:
    """Pick a batch-chunk size, or None if no valid tiling fits VMEM.

    Mosaic requires the sublane (chunk) dim to be a multiple of 8 or equal
    to the full batch; logp + direction blocks must fit the VMEM budget.
    """
    # VMEM per sample: logp in-block (f32, double-buffered) + path out-block
    # (f32, double-buffered) + direction scratch (i32, single)
    per_sample = t_y * t_x * (2 * 4 + 2 * 4 + 4)
    budget_chunk = _VMEM_BUDGET // max(per_sample, 1)
    if budget_chunk >= b:
        return b  # whole batch in one block (always legal)
    chunk = min(budget_chunk, 8)
    if chunk >= 8 and b % 8 == 0:
        return 8
    return None


def maximum_path_pallas(
    logp: jnp.ndarray, mask: jnp.ndarray, interpret: bool = None
) -> jnp.ndarray:
    """Drop-in replacement for ops.mas.maximum_path (impl='pallas').

    logp, mask: [b, t_x, t_y] -> 0/1 path [b, t_x, t_y] in logp's dtype.
    On non-TPU backends the kernel runs in interpreter mode (tests).
    Under a multi-device mesh the whole call runs inside a batch-splitting
    shard_map (Mosaic calls cannot be auto-partitioned; ops/shardwrap.py).
    """
    from .shardwrap import shard_per_sample

    return shard_per_sample(
        lambda lp, mk: _maximum_path_pallas_local(lp, mk, interpret),
        (logp, mask),
        b=logp.shape[0],
        in_dims=(0, 0),
        out_dims=0,
    )


def _maximum_path_pallas_local(
    logp: jnp.ndarray, mask: jnp.ndarray, interpret: bool = None
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b, t_x, t_y = logp.shape
    chunk = _pick_chunk(b, t_x, t_y)
    if chunk is None:
        # no legal VMEM tiling (huge t_x*t_y or awkward batch) — the scan
        # implementation handles any shape
        from .mas import _maximum_path_scan

        return _maximum_path_scan(logp, mask)
    dtype = logp.dtype
    maskf = mask.astype(jnp.float32)
    value = logp.astype(jnp.float32) * maskf
    t_x_len = jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32)[:, None]  # [b,1]
    t_y_len = jnp.sum(mask[:, 0, :], axis=1).astype(jnp.int32)[:, None]

    # [b, t_x, t_y] -> [t_y, b, t_x]: y major (one contiguous tile per DP
    # column), t_x on lanes
    value_t = value.transpose(2, 0, 1)

    grid = (b // chunk,)

    path_t = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (t_y, chunk, t_x), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t_y, chunk, t_x), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t_y, b, t_x), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((chunk, t_x), jnp.float32),
            pltpu.VMEM((t_y, chunk, t_x), jnp.float32),
        ],
        interpret=interpret,
    )(value_t, t_x_len, t_y_len)

    path = path_t.transpose(1, 2, 0).astype(dtype)
    return path * mask.astype(dtype)
