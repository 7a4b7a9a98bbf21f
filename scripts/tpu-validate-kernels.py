#!/usr/bin/env python3
"""On-chip validation: kernels + bench + convergence smoke, one command.

``make validate-tpu`` runs this when a TPU is attached (safe to re-run —
compiles cache under /tmp/jax_bench_cache) and writes ONE JSON evidence
file to docs/evidence/validate_tpu_<step>.json covering:

  1. the Mosaic compile + hardware-PRNG dropout paths of the
     encoder/text/inverse kernels (TPU variants of the autodiff-oracle
     tests run against the real PRNG),
  2. train-step A/B: encoder_fuse (encoder+prenet+dp kernels) off vs on,
     and batch-1 inference RTF A/B: fused inverse block off vs on,
  3. headline bench numbers (b=32 and b=128 train throughput),
  4. a 200-step convergence smoke: the full jitted train step (all
     kernels, compiler options, Noam-Adam) overfits one batch — loss
     must drop monotonically-ish on the chip, not just on CPU.

Usage:  python scripts/tpu-validate-kernels.py
            [--skip-tests] [--skip-ab] [--skip-smoke] [--out PATH]
"""

import dataclasses
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)  # __graft_entry__/bench live at the repo root
os.chdir(REPO)


def run_tests():
    print("== TPU in-kernel dropout tests ==", flush=True)
    proc = subprocess.run(
        [
            sys.executable, "-m", "pytest",
            "tests/test_encoder_fuse.py::test_fused_encoder_inkernel_dropout",
            "tests/test_encoder_fuse.py::"
            "test_fused_encoder_sample_packing_matches",
            "tests/test_encoder_fuse.py::"
            "test_fused_encoder_packed_dropout_oracle",
            "tests/test_text_fuse.py::test_fused_text_inkernel_dropout",
            "tests/test_block_fuse.py::test_fused_block_inkernel_dropout_grads",
            "tests/test_block_fuse.py::test_fused_wn_inkernel_dropout_grads",
            "tests/test_block_fuse.py::test_fused_block_inverse_matches_op_by_op",
            "tests/test_block_fuse.py::test_fused_block_roundtrip",
            "tests/test_block_fuse.py::test_long_utterance_bucket_step_on_tpu",
            "-q",
        ],
        env={**os.environ, "GLOW_TTS_TEST_TPU": "1"},
    )
    return proc.returncode


def run_ab():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _base_config
    from bench import bench_infer_rtf, bench_train

    out = {}
    for fuse in (False, True):
        config = dataclasses.replace(_base_config(), encoder_fuse=fuse)
        for b in (32, 128):
            st, fps = bench_train(config, b=b)
            out[f"train enc_fuse={fuse} b={b}"] = {
                "step_ms": round(st * 1e3, 3), "fps": round(fps),
            }
            print(json.dumps(out), flush=True)
    for blk in (False, True):
        config = dataclasses.replace(
            _base_config(), flow_block_fuse_reverse=blk
        )
        rtf, t, _ = bench_infer_rtf(config)
        out[f"infer inv_fuse={blk} b=1"] = {
            "rtf": round(rtf, 6), "time_s": round(t, 5),
        }
        print(json.dumps(out), flush=True)
    return out


def run_convergence_smoke(n_steps=200):
    """Overfit one synthetic batch for n_steps with the FULL train step
    (every kernel on, compiler options, Noam-Adam) chained on-device.
    Proves end-to-end training dynamics on real Mosaic, not interpret mode.
    """
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from __graft_entry__ import _base_config, _synthetic_batch
    from bench import make_train_chain
    from glow_tts_train_tpu.training import (
        _compiler_options,
        create_state,
        make_train_step,
    )

    config = _base_config()
    state = create_state(config, jax.random.PRNGKey(0))
    step_fn = make_train_step(config, mesh=None, donate=False, jit=False)
    batch = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in _synthetic_batch(config, b=32, t_x=128, t_y=640).items()
    }
    run_steps = make_train_chain(
        step_fn, n_steps, compiler_options=_compiler_options(config)
    )
    print(f"== convergence smoke: {n_steps} steps on one batch ==", flush=True)
    losses = np.asarray(run_steps(state, batch, jax.random.key(1)))
    assert np.isfinite(losses).all(), "non-finite loss in convergence smoke"
    first, last = float(losses[:10].mean()), float(losses[-10:].mean())
    result = {
        "n_steps": n_steps,
        "loss_first10_mean": round(first, 4),
        "loss_last10_mean": round(last, 4),
        "loss_final": round(float(losses[-1]), 4),
        "converged": bool(last < first - 0.5),
    }
    print(json.dumps(result), flush=True)
    assert result["converged"], (
        f"loss did not drop: first10={first:.4f} last10={last:.4f}"
    )
    return result


def _chip_kind():
    import jax

    return jax.devices()[0].device_kind


if __name__ == "__main__":
    import datetime

    evidence = {"chip": None, "argv": sys.argv[1:]}
    rc = 0
    if "--skip-tests" not in sys.argv:
        rc = run_tests()
        evidence["inkernel_dropout_tests"] = "pass" if rc == 0 else f"rc={rc}"
    if "--skip-ab" not in sys.argv:
        evidence["ab"] = run_ab()
    if "--skip-smoke" not in sys.argv:
        evidence["convergence_smoke"] = run_convergence_smoke()
    evidence["chip"] = _chip_kind()
    evidence["date"] = datetime.date.today().isoformat()

    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    elif rc == 0:
        out = os.path.join(
            REPO, "docs", "evidence",
            f"validate_tpu_{datetime.date.today().isoformat()}.json",
        )
    if out:
        with open(out, "w") as f:
            json.dump(evidence, f, indent=1)
        print(f"evidence written: {out}", flush=True)
    sys.exit(rc)
