"""Tensor-parallel parameter partitioning rules.

The reference's only distribution strategy is data parallelism (SURVEY §2);
capability parity doesn't require TP — but the param pytree is mesh-aware by
design, so tensor parallelism is a sharding-annotation change, not a
rewrite.  This module is that annotation: a PartitionSpec tree that shards
every conv's output-channel dim (and each embedding's feature dim) over a
``model`` mesh axis.  XLA/GSPMD inserts the activation reshards and
collectives; numerics are identical to the replicated layout
(tests/test_parallel.py::test_tensor_parallel_matches_data_parallel).

Memory note: the flat-vector optimizer (training.py) gathers params for the
update, so TP here shards compute/weights in the step but not optimizer
state; a fully TP-sharded optimizer is a later change.
"""

import typing

import jax
import numpy as np
from jax.sharding import PartitionSpec


def param_partition_specs(params, model_axis: str = "model"):
    """PartitionSpec tree sharding weight output-channels over model_axis.

    Rules by leaf shape/role (leaves reachable via their path names):
    * conv kernels  w/v [..., k, c_in, c_out]  -> shard c_out (last dim)
    * conv bias / weight-norm g [..., c_out]   -> shard last dim
    * embeddings [vocab, h] / rel-pos tables   -> shard last dim
    * norms (gamma/beta), actnorm, invconv     -> replicated (tiny)

    Dims that don't divide the axis size evenly are left replicated — GSPMD
    requires even sharding, and tiny tensors aren't worth padding.
    """
    mesh_size = {}

    def spec_for(path, leaf) -> PartitionSpec:
        names = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        leaf = np.asarray(leaf)
        last = names[-1] if names else ""
        if last in ("gamma", "beta") or "actnorm" in names or "invconv" in names:
            return PartitionSpec()
        # shard the last (feature/out-channel) dim when present and >1D-ish
        if leaf.ndim >= 1 and leaf.shape[-1] > 1:
            spec = [None] * (leaf.ndim - 1) + [model_axis]
            return PartitionSpec(*spec)
        return PartitionSpec()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shardable(params, mesh, specs) -> typing.Any:
    """Downgrade specs whose sharded dim doesn't divide the mesh axis."""
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def fix(leaf, spec):
        leaf = np.asarray(leaf)
        if not spec:
            return spec
        for dim, name in enumerate(spec):
            if name is not None and leaf.shape[dim] % axis_sizes[name] != 0:
                return PartitionSpec()
        return spec

    return jax.tree_util.tree_map(fix, params, specs)
