"""Mesh construction and sharding helpers.

The reference's distributed layer is NCCL DDP: one process per GPU, gradient
all-reduce in backward, DistributedSampler for data, rank-0 checkpointing
(`__main__.py:83-88,235,268-271`, `train.py:60`).

The TPU-native equivalent has no explicit communication backend at all: we
build a 1-D ``jax.sharding.Mesh`` over all devices, shard the batch along a
``data`` axis with NamedSharding, replicate parameters, and jit one train
step — XLA inserts the gradient all-reduce over ICI automatically.  Growing
to tp/pp later is a sharding-annotation change, not a rewrite; parameters
already live in a mesh-aware pytree.

Multi-host: each host feeds its local shard of the global batch
(``process_index``-strided data, data/sampler.py) and
``jax.process_index() == 0`` gates checkpoint writes.
"""

import typing

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def default_mesh(
    axis_name: str = "data",
    devices: typing.Optional[typing.Sequence] = None,
    model_parallel: int = 1,
) -> Mesh:
    """Mesh over all (or the given) devices.

    ``model_parallel=1``: 1-D data-parallel mesh.  ``model_parallel=m``:
    2-D (data, model) mesh of shape (n/m, m) — weights shard over the
    ``model`` axis (parallel/partitioning.py), batch over ``axis_name``;
    the model axis is innermost so its collectives ride neighboring ICI
    links.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if model_parallel <= 1:
        return Mesh(devices, (axis_name,))
    assert devices.size % model_parallel == 0, (
        f"{devices.size} devices do not split into model_parallel="
        f"{model_parallel}"
    )
    return Mesh(
        devices.reshape(devices.size // model_parallel, model_parallel),
        (axis_name, "model"),
    )


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(batch, mesh: typing.Optional[Mesh], axis_name: str = "data"):
    """Device-put a host batch (pytree of np arrays) with batch-dim sharding.

    Single-host: the batch is the global batch; device_put splits it across
    local devices.  Multi-host: each process passes its LOCAL rows
    (global_batch / process_count utterances) and the global array is
    assembled across processes — the data-loading equivalent of
    DistributedSampler shards feeding one global step.
    """
    if mesh is None:
        return jax.device_put(batch)
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda a: jax.make_array_from_process_local_data(sharding, a), batch
        )
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), batch)
