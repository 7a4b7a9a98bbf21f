"""Multi-chip dry run: one full training step over an n-device mesh.

Validates that the framework's GSPMD shardings compile and execute without n
real chips, exercising the same machinery a pod run uses (reference
capability: NCCL DDP at glow_tts_train/__main__.py:83-88,268-271).  Two
plans are exercised:

* 1-D data-parallel mesh — batch sharded, params replicated, gradient
  all-reduce inserted by XLA inside the single jitted train step.
* 2-D data x model mesh — weights sharded over the model axis (tensor
  parallel) with GSPMD inserting the activation reshards/collectives.

This module assumes the devices already exist (a virtual-CPU backend forced
via ``--xla_force_host_platform_device_count`` or a real pod).  The
backend-agnostic launcher lives in ``__graft_entry__.dryrun_multichip``,
which runs :func:`run` in a subprocess with the platform forced *before*
JAX initializes — the environment's TPU plugin ignores ``JAX_PLATFORMS``,
so flipping platforms after a backend touch is impossible in-process.
"""

import numpy as np


def tiny_dryrun_config():
    from glow_tts_train_tpu.config import AudioConfig, ModelConfig, TrainingConfig

    model = ModelConfig(
        num_symbols=40,
        hidden_channels=16,
        filter_channels=32,
        filter_channels_dp=16,
        n_blocks_dec=2,
        n_layers_enc=2,
        n_block_layers=2,
        hidden_channels_enc=16,
        hidden_channels_dec=16,
    )
    audio = AudioConfig(mel_channels=8)
    return TrainingConfig(model=model, audio=audio, fp16_run=False)


def synthetic_batch(config, b, t_x, t_y, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(1, config.model.num_symbols, size=(b, t_x)).astype(np.int32)
    x_lengths = np.full((b,), t_x, np.int32)
    y = rng.standard_normal((b, t_y, config.audio.mel_channels)).astype(np.float32)
    y_lengths = np.full((b,), t_y, np.int32)
    return {"x": x, "x_lengths": x_lengths, "y": y, "y_lengths": y_lengths}


def run(n_devices: int) -> None:
    """Execute the dry run on the first ``n_devices`` visible devices."""
    import jax

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {len(devices)} "
        f"(platform={jax.default_backend()})"
    )

    from glow_tts_train_tpu.parallel import default_mesh, shard_batch
    from glow_tts_train_tpu.training import create_state, make_train_step

    config = tiny_dryrun_config()
    config.batch_size = 2 * n_devices
    mesh = default_mesh(config.mesh_axis, devices=devices)

    state = create_state(config, jax.random.PRNGKey(0))
    step_fn = make_train_step(config, mesh=mesh, donate=False)
    batch = synthetic_batch(config, b=config.batch_size, t_x=16, t_y=48)
    sharded = shard_batch(batch, mesh, config.mesh_axis)

    state, metrics = step_fn(state, sharded, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss {loss} in multichip dryrun"
    print(f"dryrun_multichip({n_devices}): data-parallel OK loss={loss:.4f}")

    # 2-D data x model mesh: weights sharded over the model axis (tensor
    # parallel), batch over data — full fwd+bwd executes with GSPMD
    # inserting the reshards/collectives.
    if n_devices >= 4 and n_devices % 2 == 0:
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        from glow_tts_train_tpu.models import (
            duration_loss,
            forward_train,
            hyper_from_config,
            mle_loss,
        )
        from glow_tts_train_tpu.parallel.partitioning import (
            param_partition_specs,
            shardable,
        )

        hp = hyper_from_config(config)
        mesh2 = Mesh(
            np.asarray(devices).reshape(n_devices // 2, 2), ("data", "model")
        )
        specs = shardable(state.params, mesh2, param_partition_specs(state.params))
        param_sh = jax.tree_util.tree_map(lambda s: NamedSharding(mesh2, s), specs)
        data_sh = NamedSharding(mesh2, PartitionSpec("data"))
        repl = NamedSharding(mesh2, PartitionSpec())

        def loss_fn(params, b):
            (z, z_m, z_logs, logdet, z_mask), _, (_, logw, logw_) = forward_train(
                params, hp, b["x"], b["x_lengths"], b["y"], b["y_lengths"],
                deterministic=True,
            )
            return mle_loss(z, z_m, z_logs, logdet, z_mask) + duration_loss(
                logw, logw_, b["x_lengths"]
            )

        sp = jax.tree_util.tree_map(jax.device_put, state.params, param_sh)
        sb = jax.tree_util.tree_map(
            lambda a: jax.device_put(jnp.asarray(a), data_sh), batch
        )
        loss_tp, grads_tp = jax.jit(
            jax.value_and_grad(loss_fn),
            in_shardings=(param_sh, data_sh),
            out_shardings=(repl, param_sh),
        )(sp, sb)
        del grads_tp
        assert np.isfinite(float(loss_tp))
        print(
            f"dryrun_multichip({n_devices}): tensor-parallel "
            f"({n_devices // 2}x2 data x model) OK loss={float(loss_tp):.4f}"
        )


if __name__ == "__main__":
    import sys

    run(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
