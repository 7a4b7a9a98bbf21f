"""Tensor-parallel parameter partitioning rules.

The reference's only distribution strategy is data parallelism (SURVEY §2);
capability parity doesn't require TP — but the param pytree is mesh-aware by
design, so tensor parallelism is a sharding-annotation change, not a
rewrite.  This module is that annotation: a PartitionSpec tree that shards
every conv's output-channel dim (and each embedding's feature dim) over a
``model`` mesh axis.  XLA/GSPMD inserts the activation reshards and
collectives; numerics are identical to the replicated layout
(tests/test_parallel.py::test_tensor_parallel_matches_data_parallel).

The optimizer state is a pytree with the same structure as the params
(tree-form optax Adam, training.py), so the same spec tree shards the Adam
moments alongside the weights — ``opt_state_partition_specs`` maps the
param specs onto the optimizer chain state.
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


def opt_state_partition_specs(opt_state, params, param_specs) -> typing.Any:
    """PartitionSpec tree for the optax chain state.

    The tree-form optimizer's Adam moments (mu/nu) are pytrees with exactly
    the param tree's structure, so they shard with the same specs as the
    weights they track; every other leaf (step counts, scalars) is
    replicated.  Matching is structural — any subtree of the chain state
    whose treedef equals the param treedef gets ``param_specs`` — so the
    mapping survives optax chain reordering.
    """
    treedef = jax.tree_util.tree_structure(params)

    def is_param_tree(x):
        return jax.tree_util.tree_structure(x) == treedef

    return jax.tree_util.tree_map(
        lambda x: param_specs if is_param_tree(x) else PartitionSpec(),
        opt_state,
        is_leaf=is_param_tree,
    )


def train_state_shardings(state, mesh, model_axis: str = "model"):
    """NamedSharding tree for a TrainState on a (data, model) mesh.

    Params shard per :func:`param_partition_specs` (downgraded where a dim
    does not divide the axis), the optimizer's Adam moments shard like the
    params they track, and scalars (step, schedule counts) replicate.
    """
    from jax.sharding import NamedSharding

    is_spec = lambda x: isinstance(x, PartitionSpec)  # noqa: E731
    pspecs = shardable(
        state.params, mesh, param_partition_specs(state.params, model_axis)
    )
    ospecs = opt_state_partition_specs(state.opt_state, state.params, pspecs)

    def to_sh(tree):
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), tree, is_leaf=is_spec
        )

    return type(state)(
        to_sh(pspecs), to_sh(ospecs), NamedSharding(mesh, PartitionSpec())
    )


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
