"""Pallas TPU kernel for Monotonic Alignment Search.

The lax.scan MAS (ops/mas.py) dispatches one XLA loop step per mel frame —
correct everywhere, but each step is a handful of tiny VPU ops with loop
overhead around them.  This kernel fuses the entire DP (forward column
recurrence + backtrace) into ONE kernel: logp lives in VMEM, the column
state is a register vector, and the sequential loops are in-kernel
`fori_loop`s with zero dispatch overhead.

Layout: work is tiled over batch chunks (grid over b/CHUNK); inside a chunk
the DP state is [CHUNK, t_x] — CHUNK rides sublanes, t_x rides lanes, so the
per-column update is a few full-width VPU ops.  Two variants share that
layout:

* single-kernel (below): logp + direction live in VMEM whole — lowest
  overhead where they fit (the chunk size is chosen to fit the budget);
* streaming two-pass (further below): y-blocks of logp/direction/path DMA
  between HBM and VMEM under a (batch-chunk, y-block) grid while the DP
  state persists in scratch — handles shapes of ANY size, 2.5-5x faster
  than the column scan at training and 30s-utterance shapes on v5e
  (BASELINE.md round 3h).

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
    """Pick a batch-chunk size for the SINGLE-KERNEL path, or None if no
    valid tiling fits VMEM (the streaming path handles those shapes).

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


# ---------------------------------------------------------------------------
# Streaming variant: shapes whose logp does not fit VMEM.
#
# The DP is split into two passes over HBM-resident [t_y, b, t_x] arrays:
#   pass 1 (forward):  y-blocks of logp stream in, direction blocks stream
#     out, the [chunk, t_x] column state persists in VMEM scratch across
#     grid steps (reset at y-block 0 of each batch chunk);
#   pass 2 (backtrace): direction blocks stream back in REVERSE y order
#     (index_map reverses the block index), the per-sample row index
#     persists in scratch, one-hot path blocks stream out.
# Pallas double-buffers the block DMAs against the in-kernel fori_loop, so
# the sequential recurrence runs at VPU speed instead of one XLA dispatch
# per mel frame.  Total sequential iterations: (b/chunk) * t_y_pad — chunk
# is chosen as large as VMEM allows to minimize that product.
# ---------------------------------------------------------------------------


def _fwd_stream_kernel(logp_ref, txl_ref, tyl_ref, dir_ref, v_ref, *, t_blk):
    t_blk_, chunk, t_x = logp_ref.shape
    j = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, t_x), 1)
    txl = txl_ref[:]  # [chunk, 1] int32
    in_tx = jnp.where(lane < txl, 1.0, 0.0)

    @pl.when(j == 0)
    def _reset_state():
        v_ref[:] = jnp.zeros((chunk, t_x), jnp.float32)

    y0 = j * t_blk

    def fwd(yy, _):
        y = y0 + yy
        v = v_ref[:]
        row = logp_ref[yy, :, :]
        v0 = pltpu.roll(v, shift=1, axis=1)
        v0 = jnp.where(lane == 0, _MAX_NEG, v0)
        stay = jnp.where(v >= v0, 1.0, 0.0)
        v_max = jnp.maximum(v, v0)
        v_ref[:] = jnp.where(lane <= y, v_max + row, _MAX_NEG)
        dir_ref[yy, :, :] = stay * in_tx + (1.0 - in_tx)
        return 0

    jax.lax.fori_loop(0, t_blk_, fwd, 0)


def _bwd_stream_kernel(txl_ref, tyl_ref, dir_ref, path_ref, idx_ref, *,
                       t_blk, n_yblk):
    t_blk_, chunk, t_x = dir_ref.shape
    j = pl.program_id(1)  # processes y-block (n_yblk - 1 - j)
    lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, t_x), 1)
    txl = txl_ref[:]
    tyl = tyl_ref[:]

    @pl.when(j == 0)
    def _reset_index():
        idx_ref[:, :] = jnp.broadcast_to(
            jnp.maximum(txl - 1, 0), idx_ref.shape
        )

    y0 = (n_yblk - 1 - j) * t_blk

    def bwd(k, _):
        yy = t_blk_ - 1 - k
        y = y0 + yy
        index = idx_ref[:, :1]  # [chunk, 1]
        active = jnp.where(y < tyl, 1.0, 0.0)  # [chunk, 1]
        onehot = jnp.where(lane == index, 1.0, 0.0)  # [chunk, t_x]
        path_ref[yy, :, :] = active * onehot
        d = jnp.sum(onehot * dir_ref[yy, :, :], axis=1, keepdims=True)
        d = d.astype(jnp.int32)
        # explicit index==0 (stay) / index==y (move) overrides — the stored
        # direction at those cells compared against the -1e9 sentinel
        d = jnp.where(index == 0, 1, jnp.where(index == y, 0, d))
        step = jnp.maximum(index + d - 1, 0)
        new_index = jnp.where(y < tyl, step, index)
        idx_ref[:, :] = jnp.broadcast_to(new_index, idx_ref.shape)
        return 0

    jax.lax.fori_loop(0, t_blk_, bwd, 0)


def _stream_tiling(b: int, t_x_pad: int, t_y: int):
    """(chunk, t_blk, t_y_pad) for the streaming kernels.

    chunk: the largest multiple-of-8 divisor of b (<=256) that still leaves
    t_blk >= 8 y-rows per streamed block within the VMEM budget — bigger
    chunks directly cut the total sequential iteration count
    (b/chunk)*t_y_pad, which is what the recurrence pays for.  Falls back
    to b itself when b has no multiple-of-8 divisor (a whole-batch block is
    always legal).  t_blk: y-rows per streamed block, sized so ~6 blocks
    (in + out, double-buffered, both passes) fit the VMEM budget.
    """
    candidates = [b]
    if b % 8 == 0:
        candidates = sorted(
            (c for c in range(8, min(b, 256) + 1, 8) if b % c == 0),
            reverse=True,
        ) + [8]
    for chunk in candidates:
        row_bytes = chunk * t_x_pad * 4
        t_blk = min(512, _VMEM_BUDGET // (6 * row_bytes))
        if t_blk >= 8 or chunk == candidates[-1]:
            t_blk = max(8, t_blk)
            t_y_pad = -(-t_y // t_blk) * t_blk
            return chunk, t_blk, t_y_pad
    raise AssertionError("unreachable")


def _maximum_path_pallas_stream(
    logp: jnp.ndarray, mask: jnp.ndarray, interpret: bool = None
) -> jnp.ndarray:
    """Streaming two-pass MAS for shapes whose logp does not fit VMEM."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b, t_x, t_y = logp.shape
    dtype = logp.dtype
    maskf = mask.astype(jnp.float32)
    value = logp.astype(jnp.float32) * maskf
    t_x_len = jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32)[:, None]
    t_y_len = jnp.sum(mask[:, 0, :], axis=1).astype(jnp.int32)[:, None]

    t_x_pad = -(-t_x // 128) * 128
    chunk, t_blk, t_y_pad = _stream_tiling(b, t_x_pad, t_y)
    n_yblk = t_y_pad // t_blk

    # [b, t_x, t_y] -> [t_y_pad, b, t_x_pad]: y-major blocks, t_x on lanes.
    # Padded cells are zero; rows y >= t_y_i are never read by the
    # backtrace (active = y < t_y_i) and lanes x >= t_x_i are forced to
    # "stay" in the direction array, so padding never changes the path.
    value_t = jnp.pad(
        value.transpose(2, 0, 1),
        ((0, t_y_pad - t_y), (0, 0), (0, t_x_pad - t_x)),
    )

    grid = (b // chunk, n_yblk)
    yblock = lambda sh: pl.BlockSpec(
        sh, lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
    )
    yblock_rev = lambda sh: pl.BlockSpec(
        sh, lambda i, j: (grid[1] - 1 - j, i, 0), memory_space=pltpu.VMEM
    )
    lens = pl.BlockSpec((chunk, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)

    direction = pl.pallas_call(
        functools.partial(_fwd_stream_kernel, t_blk=t_blk),
        grid=grid,
        in_specs=[yblock((t_blk, chunk, t_x_pad)), lens, lens],
        out_specs=yblock((t_blk, chunk, t_x_pad)),
        out_shape=jax.ShapeDtypeStruct((t_y_pad, b, t_x_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((chunk, t_x_pad), jnp.float32)],
        interpret=interpret,
    )(value_t, t_x_len, t_y_len)

    path_t = pl.pallas_call(
        functools.partial(_bwd_stream_kernel, t_blk=t_blk, n_yblk=n_yblk),
        grid=grid,
        in_specs=[lens, lens, yblock_rev((t_blk, chunk, t_x_pad))],
        out_specs=yblock_rev((t_blk, chunk, t_x_pad)),
        out_shape=jax.ShapeDtypeStruct((t_y_pad, b, t_x_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((chunk, 128), jnp.int32)],
        interpret=interpret,
    )(t_x_len, t_y_len, direction)

    path = path_t[:t_y, :, :t_x].transpose(1, 2, 0).astype(dtype)
    return path * mask.astype(dtype)


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
        # logp does not fit VMEM whole — stream it in y-blocks instead
        # (two-pass kernel; measured 4-19x faster than the column scan at
        # training/long-utterance shapes, BASELINE.md round 3h)
        return _maximum_path_pallas_stream(logp, mask, interpret)
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
