"""Fused Pallas kernels under a GSPMD mesh (ops/shardwrap.py).

GSPMD cannot auto-partition Mosaic custom calls — on a real multi-chip
mesh, lowering any pallas_call inside the jitted train step raises
``NotImplementedError: Mosaic kernels cannot be automatically
partitioned`` (jax/_src/tpu_custom_call.py).  shardwrap runs every
per-sample kernel inside a fully-manual shard_map: batch split across the
mesh axes that divide it, weights replicated, weight-grads psummed, and
the dropout seed offset per shard so per-sample PRNG streams are
preserved exactly.

These tests prove, on the virtual 8-device CPU mesh (interpret-mode
kernels — the same shard_map plumbing the Mosaic path uses):

* kernel forward under a mesh is BIT-identical to the unsharded kernel,
  including with in-kernel dropout active (seed offsetting);
* the full train step with every fusion forced on matches the meshless
  step (loss + updated params) on 8x1 and 4x2 (tensor-parallel) meshes;
* a batch no mesh axis divides falls back to replicated-but-correct;
* MAS's Pallas kernel matches under the mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from glow_tts_train_tpu import training

from helpers import random_batch, tiny_config

# measured 2026-08-19: interpret-mode kernels under 8-device shard_map (~1 min); `make test` skips, `make test-all` runs
pytestmark = pytest.mark.slow


def fused_config(**over):
    config = tiny_config(**over)
    config.wn_impl = "pallas"
    config.flow_block_fuse = True
    config.flow_block_fuse_reverse = True
    config.encoder_fuse = True
    return config


def make_mesh(shape, names):
    devices = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devices, names)


def tree_close(a, b, atol, err=""):
    for (pa, la), (_, lb) in zip(
        jax.tree_util.tree_leaves_with_path(a),
        jax.tree_util.tree_leaves_with_path(b),
    ):
        np.testing.assert_allclose(
            np.asarray(la, np.float32),
            np.asarray(lb, np.float32),
            atol=atol,
            rtol=0,
            err_msg=f"{err}:{jax.tree_util.keystr(pa)}",
        )


def test_wn_kernel_forward_bit_identical_under_mesh():
    """wn_apply_pallas (interpret) under an 8-device mesh == unsharded,
    bit-for-bit, with in-kernel dropout ACTIVE — proves the per-shard
    seed offset reproduces every per-sample stream."""
    from glow_tts_train_tpu.ops.flows import wn_init
    from glow_tts_train_tpu.ops.wn_pallas import (
        fold_wn_weights,
        wn_stack_fused,
    )

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    h, b, t, L = 16, 8, 24, 2
    params = wn_init(k1, h, kernel_size=3, n_layers=L)
    x = jax.random.normal(k2, (b, t, h), jnp.float32)
    mask = jnp.ones((b, t, 1), jnp.float32)

    W_in, b_in, W_rs, b_rs = fold_wn_weights(params, L, x.dtype)
    g_all = jnp.zeros((b, L, 2 * h), x.dtype)
    seed = jnp.int32(1234)

    def g(x):
        return wn_stack_fused(
            W_in, b_in, W_rs, b_rs, x, mask, g_all, seed,
            kernel_size=3, dilation_rate=1, n_layers=L,
            p_dropout=0.3, deterministic=False, interpret=True,
        )

    ref = jax.jit(g)(x)
    mesh = make_mesh((8,), ("data",))
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(g)(x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


@pytest.mark.parametrize(
    "shape,names",
    [((8,), ("data",)), ((4, 2), ("data", "model"))],
    ids=["dp8", "dp4xtp2"],
)
def test_train_step_fused_kernels_on_mesh(shape, names):
    """Full train step, every fusion forced on (interpret kernels), on a
    mesh vs single-device: loss and updated params agree (the only
    difference is float reduction order of the cross-shard psums)."""
    from glow_tts_train_tpu.parallel import shard_batch

    config = fused_config(p_dropout=0.0, p_dropout_dec=0.0)
    config.batch_size = 8
    state = training.create_state(config, jax.random.PRNGKey(0))
    batch = random_batch(config, np.random.default_rng(3), b=8)
    rng = jax.random.PRNGKey(7)

    ref_step = training.make_train_step(config, donate=False)
    ref_state, ref_metrics = ref_step(state, batch, rng)

    mesh = make_mesh(shape, names)
    state2 = training.create_state(config, jax.random.PRNGKey(0))
    step = training.make_train_step(
        config, mesh=mesh, donate=False, state=state2
    )
    sharded = shard_batch(batch, mesh, config.mesh_axis)
    out_state, metrics = step(state2, sharded, rng)

    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), atol=1e-4
    )
    tree_close(out_state.params, ref_state.params, atol=5e-5, err="params")


def test_kernel_indivisible_batch_replicated_fallback():
    """batch=3 on an 8-device mesh: no mesh axis divides it, so shardwrap
    runs the kernel fully replicated (every device computes the whole
    batch) — redundant but bit-identical to the unsharded kernel.  The
    train step itself always has divisible batches (batch_sharding
    enforces it); this covers direct kernel use at odd batch sizes."""
    from glow_tts_train_tpu.ops.flows import wn_init
    from glow_tts_train_tpu.ops.wn_pallas import (
        fold_wn_weights,
        wn_stack_fused,
    )

    h, b, t, L = 16, 3, 24, 2
    k1, k2 = jax.random.split(jax.random.PRNGKey(8))
    params = wn_init(k1, h, kernel_size=3, n_layers=L)
    x = jax.random.normal(k2, (b, t, h), jnp.float32)
    mask = jnp.ones((b, t, 1), jnp.float32)
    W_in, b_in, W_rs, b_rs = fold_wn_weights(params, L, x.dtype)
    g_all = jnp.zeros((b, L, 2 * h), x.dtype)

    def g(x):
        return wn_stack_fused(
            W_in, b_in, W_rs, b_rs, x, mask, g_all, jnp.int32(7),
            kernel_size=3, dilation_rate=1, n_layers=L,
            p_dropout=0.3, deterministic=False, interpret=True,
        )

    ref = jax.jit(g)(x)
    mesh = make_mesh((8,), ("data",))
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(g)(x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_mas_pallas_under_mesh():
    from glow_tts_train_tpu.ops.mas import maximum_path
    from glow_tts_train_tpu.ops.masks import sequence_mask

    rng = np.random.default_rng(0)
    b, t_x, t_y = 8, 12, 32
    logp = jnp.asarray(rng.standard_normal((b, t_x, t_y)), jnp.float32)
    tx = jnp.asarray(rng.integers(2, t_x + 1, b), jnp.int32)
    ty = jnp.asarray(2 * tx + rng.integers(0, 5, b).astype(np.int32))
    mask = (
        sequence_mask(tx, t_x)[:, :, None]
        * sequence_mask(ty, t_y)[:, None, :]
    ).astype(jnp.float32)

    ref = jax.jit(lambda l, m: maximum_path(l, m, impl="pallas"))(logp, mask)
    mesh = make_mesh((8,), ("data",))
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(lambda l, m: maximum_path(l, m, impl="pallas"))(
            logp, mask
        )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_wn_kernel_grads_match_under_mesh():
    """Weight grads through the custom VJP under the mesh (psum path)
    match the single-device kernel to reduction-order tolerance."""
    from glow_tts_train_tpu.ops.flows import wn_init
    from glow_tts_train_tpu.ops.wn_pallas import (
        fold_wn_weights,
        wn_stack_fused,
    )

    h, b, t, L = 16, 8, 24, 2
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    params = wn_init(k1, h, kernel_size=3, n_layers=L)
    x = jax.random.normal(k2, (b, t, h), jnp.float32)
    mask = jnp.ones((b, t, 1), jnp.float32)
    W_in, b_in, W_rs, b_rs = fold_wn_weights(params, L, x.dtype)
    g_all = jnp.zeros((b, L, 2 * h), x.dtype)
    seed = jnp.int32(99)

    def loss(w):
        W_in_, x_ = w
        out = wn_stack_fused(
            W_in_, b_in, W_rs, b_rs, x_, mask, g_all, seed,
            kernel_size=3, dilation_rate=1, n_layers=L,
            p_dropout=0.25, deterministic=False, interpret=True,
        )
        return jnp.sum(out * out)

    ref = jax.jit(jax.grad(loss))((W_in, x))
    mesh = make_mesh((4, 2), ("data", "model"))
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(jax.grad(loss))((W_in, x))
    # dx is per-sample (exactly equal); dW crosses shards via psum
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(out[1]))
    np.testing.assert_allclose(
        np.asarray(ref[0]), np.asarray(out[0]), atol=1e-4, rtol=1e-5
    )
