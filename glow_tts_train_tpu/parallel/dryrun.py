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

    # The round-4 TPU default combo under the mesh: WN kernel with
    # residual-STORE backward + unrolled blocks (the fwd_save/bwd_store
    # pallas calls have their own shardwrap signatures — per-block
    # residuals split over the batch axes, weight-grads psummed).
    config_s = dataclasses.replace(
        config,
        wn_impl="pallas",
        wn_residuals="store",
        unroll_blocks=True,
        encoder_fuse=True,
    )
    state_s = create_state(config_s, jax.random.PRNGKey(0))
    step_s = make_train_step(config_s, mesh=mesh, donate=False)
    state_s, metrics_s = step_s(
        state_s, shard_batch(batch, mesh, config_s.mesh_axis),
        jax.random.PRNGKey(1),
    )
    loss_s = float(metrics_s["loss"])
    assert np.isfinite(loss_s), f"non-finite store+unroll loss {loss_s}"
    print(
        f"dryrun_multichip({n_devices}): store+unroll kernels under "
        f"shard_map OK loss={loss_s:.4f}"
    )

    # Gradient accumulation under the mesh: the microbatch lax.scan inside
    # the sharded train step (training.py accum_grads).  grad_accum_steps=2
    # splits each per-device shard in half; the summed ratio-normalized
    # gradients must execute and produce the same finite loss semantics
    # (exact equality with the full batch is proven by test_grad_accum).
    config_a = dataclasses.replace(config, grad_accum_steps=2)
    state4 = create_state(config_a, jax.random.PRNGKey(0))
    step4 = make_train_step(config_a, mesh=mesh, donate=False)
    state4, metrics4 = step4(
        state4, shard_batch(batch, mesh, config_a.mesh_axis),
        jax.random.PRNGKey(1),
    )
    loss_a = float(metrics4["loss"])
    assert np.isfinite(loss_a), f"non-finite grad-accum loss {loss_a}"
    print(
        f"dryrun_multichip({n_devices}): grad-accum (2 microbatches) "
        f"OK loss={loss_a:.4f}"
    )

    # TRUE multi-process semantics: two OS processes rendezvous through the
    # real train CLI via jax.distributed (Gloo collectives, per-process
    # data sharding, chief-gated writes) — the CPU stand-in for a
    # multi-host pod (reference DDP: __main__.py:83-88,268-271).
    if n_devices >= 4:
        run_two_process()


def run_two_process(attempts: int = 3) -> None:
    """One epoch of 2-process distributed training through the real CLI.

    Mirrors tests/test_multihost.py: each process federates 2 virtual CPU
    devices into a 4-device global mesh; retries absorb the inherent
    coordinator-port TOCTOU race and compile-skew timeouts.
    """
    import json
    import os
    import socket
    import subprocess
    import sys
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory(prefix="glow_dryrun_2proc_") as tmp:
        tmp_path = Path(tmp)
        rng = np.random.default_rng(0)
        mels_dir = tmp_path / "mels"
        mels_dir.mkdir()
        with open(tmp_path / "phonemes.csv", "w") as f:
            for i in range(24):
                utt = f"u{i:02d}"
                n = int(rng.integers(4, 10))
                ids = " ".join(map(str, rng.integers(1, 20, n)))
                f.write(f"{utt}|{ids}\n")
                mel = rng.standard_normal((8, int(rng.integers(2 * n + 2, 40))))
                np.save(mels_dir / f"{utt}.npy", mel.astype(np.float32))
        config = {
            "epochs": 1,
            "batch_size": 8,
            "warmup_steps": 10,
            "bucket_size_text": 8,
            "bucket_size_mel": 16,
            # orbax: the save is a cross-process collective and the leg-7
            # resume below restores it in a FRESH 2-process topology
            "checkpoint_format": "orbax",
            "audio": {"mel_channels": 8},
            "model": {
                "num_symbols": 20, "hidden_channels": 16,
                "filter_channels": 32, "filter_channels_dp": 16,
                "n_blocks_dec": 2, "n_layers_enc": 2, "n_block_layers": 2,
                "hidden_channels_enc": 16, "hidden_channels_dec": 16,
            },
        }
        with open(tmp_path / "config.json", "w") as f:
            json.dump(config, f)

        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["XLA_FLAGS"] = " ".join(
            fl
            for fl in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in fl
        )
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

        def launch(port, proc_id, output, extra=()):
            return subprocess.Popen(
                [
                    sys.executable, "-m", "glow_tts_train_tpu",
                    "--output", str(output),
                    "--dataset", "0", str(tmp_path / "phonemes.csv"),
                    str(mels_dir), "--mels-dir",
                    "--config", str(tmp_path / "config.json"),
                    "--platform", "cpu", "--virtual-devices", "2",
                    "--coordinator", f"localhost:{port}",
                    "--num-processes", "2", "--process-id", str(proc_id),
                    *extra,
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )

        def run_pair(output, extra=()):
            last_outs = []
            for _ in range(attempts):
                with socket.socket() as s:
                    s.bind(("localhost", 0))
                    port = s.getsockname()[1]
                procs = [launch(port, i, output, extra) for i in (0, 1)]
                try:
                    last_outs = [p.communicate(timeout=600)[0] for p in procs]
                except subprocess.TimeoutExpired:
                    for p in procs:
                        if p.poll() is None:
                            p.kill()
                        p.communicate()
                    continue
                if all(p.returncode == 0 for p in procs):
                    return last_outs
            raise AssertionError(
                "2-process dryrun failed after retries; outputs:\n"
                + "\n---\n".join(out[-2000:] for out in last_outs)
            )

        run_pair(tmp_path / "model")
        # checkpoint name carries the post-epoch global step — glob it
        ckpts = list((tmp_path / "model").glob("checkpoint_*.orbax"))
        assert ckpts, "2-process run saved no orbax checkpoint"
        print(
            "dryrun_multichip: 2-process jax.distributed "
            "(2x2 virtual devices, Gloo, collective orbax save) OK"
        )

        # Leg 7 — restore-and-continue: a FRESH 2-process rendezvous
        # restores the collective orbax checkpoint and trains one more
        # epoch (the multi-process version of the reference's whole
        # recovery story, __main__.py:251-262; bit-exact state match vs an
        # uninterrupted run is proven by tests/test_multihost.py).
        outs = run_pair(
            tmp_path / "model2", extra=("--checkpoint", str(max(ckpts)))
        )
        resumed = list((tmp_path / "model2").glob("checkpoint_*.orbax"))
        assert resumed, "resumed 2-process run saved no checkpoint"
        assert any("resuming at data epoch" in out for out in outs), (
            "resume leg did not log checkpoint restore"
        )
        print(
            "dryrun_multichip: 2-process restore-and-continue "
            "(orbax collective restore, +1 epoch) OK"
        )


if __name__ == "__main__":
    import sys

    run(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
