"""Run the per-sample Pallas kernels under a GSPMD mesh via shard_map.

GSPMD cannot auto-partition Mosaic custom calls: lowering any pallas_call
inside a jit that spans more than one device raises ``NotImplementedError:
Mosaic kernels cannot be automatically partitioned. Please wrap the call in
a shard_map.`` (jax/_src/tpu_custom_call.py).  Without this module the
framework's fused kernels — its single biggest perf asset — would fail to
compile on any real multi-chip mesh, a failure invisible to CPU tests
(interpret mode never lowers to Mosaic) and to the single-chip bench.

Every kernel in this package is per-sample (the pallas grid runs over the
batch), so the legal partitioning is plain data parallelism:

* split the batch dimension across every mesh axis whose size divides it
  (falling back to full replication — redundant but correct — when none
  do, e.g. batch 3 on an 8-device mesh);
* replicate the weights in (GSPMD inserts the all-gather when they are
  stored tensor-parallel-sharded);
* psum the weight-gradient accumulators over the batch-split axes on the
  way out (each shard accumulates only its samples);
* offset the dropout seed by ``shard_index * local_batch`` so every sample
  keeps the exact per-sample PRNG stream of the unsharded kernel — the
  sharded forward/backward are bit-identical per sample, and backward
  replays forward's masks regardless of how the batch was split.

The mesh is discovered at trace time with jax.sharding.get_abstract_mesh();
training.make_train_step traces its jitted step under
jax.sharding.set_mesh(mesh) to make it visible.  No mesh, or a one-device
mesh, leaves the call untouched — the single-chip hot path is unchanged.
"""

import typing

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

Dim = typing.Optional[int]  # batch-dim index of an array, or None


def ambient_mesh():
    """The mesh this trace is running under, or None for single-device."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty or mesh.size <= 1:
        return None
    return mesh


def _split_axes(mesh, b: int):
    """Mesh axes (in mesh order) whose cumulative product divides b."""
    axes: typing.List[str] = []
    prod = 1
    for name in mesh.axis_names:
        size = mesh.shape[name]
        if b % (prod * size) == 0:
            axes.append(name)
            prod *= size
    return tuple(axes), prod


def _spec(dim: Dim, axes) -> P:
    if dim is None or not axes:
        return P()
    return P(*([None] * dim), tuple(axes))


def shard_per_sample(
    call,
    args,
    *,
    b: int,
    in_dims: typing.Sequence[Dim],
    out_dims,
    seed_arg: typing.Optional[int] = None,
):
    """Run ``call(*args)`` (which builds a pallas_call from its operands'
    shapes) under the ambient mesh, splitting the batch.

    ``in_dims``/``out_dims``: per-array batch-dim index, or None for
    replicated inputs / batch-summed accumulator outputs (psummed over the
    split axes).  ``out_dims`` may be a single value for single-output
    calls.  ``seed_arg`` indexes the (1,)-shaped int32 PRNG seed in
    ``args``; it is offset per shard to preserve per-sample streams.

    ``call`` must derive every shape from its operands (the batch it sees
    is the LOCAL shard), and must not close over batch-sized values.
    """
    mesh = ambient_mesh()
    if mesh is None:
        return call(*args)
    axes, prod = _split_axes(mesh, b)
    local_b = b // prod
    single = not isinstance(out_dims, (tuple, list))
    out_dims_t = (out_dims,) if single else tuple(out_dims)
    in_specs = tuple(_spec(d, axes) for d in in_dims)
    out_specs_t = tuple(_spec(d, axes) for d in out_dims_t)

    def local(*local_args):
        local_args = list(local_args)
        if axes and seed_arg is not None:
            idx = jnp.zeros((), jnp.int32)
            for name in axes:
                idx = idx * np.int32(mesh.shape[name]) + jax.lax.axis_index(
                    name
                )
            local_args[seed_arg] = local_args[seed_arg] + idx * np.int32(
                local_b
            )
        outs = call(*local_args)
        outs_t = (outs,) if single else tuple(outs)
        if axes:
            outs_t = tuple(
                o if d is not None else jax.lax.psum(o, axes)
                for o, d in zip(outs_t, out_dims_t)
            )
        return outs_t[0] if single else outs_t

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs_t[0] if single else out_specs_t,
        check_vma=False,
    )(*args)
