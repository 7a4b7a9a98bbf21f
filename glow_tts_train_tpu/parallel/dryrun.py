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

    # 2-D data x model mesh: the INTEGRATED tensor-parallel path the CLI's
    # --model-parallel flag uses — one full train step with weights and
    # Adam moments sharded over the model axis (train_state_shardings),
    # GSPMD inserting the activation reshards/collectives.
    if n_devices >= 4 and n_devices % 2 == 0:
        mesh2 = default_mesh(
            config.mesh_axis, devices=devices, model_parallel=2
        )
        state2 = create_state(config, jax.random.PRNGKey(0))
        step2 = make_train_step(config, mesh=mesh2, donate=False, state=state2)
        state2, metrics2 = step2(
            state2, shard_batch(batch, mesh2, config.mesh_axis),
            jax.random.PRNGKey(1),
        )
        loss_tp = float(metrics2["loss"])
        assert np.isfinite(loss_tp), f"non-finite TP loss {loss_tp}"
        n_sharded = sum(
            1
            for leaf in jax.tree_util.tree_leaves(state2.params)
            if hasattr(leaf, "sharding")
            and "model" in (leaf.sharding.spec or ())
        )
        assert n_sharded > 0, "TP dryrun produced no model-sharded params"
        print(
            f"dryrun_multichip({n_devices}): tensor-parallel "
            f"({n_devices // 2}x2 data x model, {n_sharded} sharded params) "
            f"OK loss={loss_tp:.4f}"
        )

    # Fused-kernel path under the mesh: on a real pod the Pallas kernels
    # run inside shardwrap's batch-splitting shard_map (GSPMD cannot
    # auto-partition Mosaic calls).  Force every fusion on (interpret mode
    # off-TPU — same shard_map plumbing, pure-JAX kernel body) and run one
    # DP step to prove the integrated path compiles and executes.
    import dataclasses

    config_k = dataclasses.replace(
        config,
        wn_impl="pallas",
        flow_block_fuse=True,
        encoder_fuse=True,
    )
    state3 = create_state(config_k, jax.random.PRNGKey(0))
    step3 = make_train_step(config_k, mesh=mesh, donate=False)
    state3, metrics3 = step3(
        state3, shard_batch(batch, mesh, config_k.mesh_axis),
        jax.random.PRNGKey(1),
    )
    loss_k = float(metrics3["loss"])
    # no equality check vs the op-by-op loss: in-kernel dropout draws a
    # different (equally valid) stream; tests/test_kernel_mesh.py proves
    # numerical equality with dropout off
    assert np.isfinite(loss_k), f"non-finite fused-kernel loss {loss_k}"
    print(
        f"dryrun_multichip({n_devices}): fused kernels under shard_map "
        f"OK loss={loss_k:.4f}"
    )


if __name__ == "__main__":
    import sys

    run(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
