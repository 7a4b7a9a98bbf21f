#!/usr/bin/env python3
"""On-chip validation + A/B for the round-3f kernels (run when a TPU is
attached; safe to re-run — compiles cache under /tmp/jax_bench_cache).

Covers what CPU interpret mode cannot prove:
  1. the Mosaic compile + hardware-PRNG dropout paths of the
     encoder/text/inverse kernels (TPU variants of the autodiff-oracle
     tests run against the real PRNG),
  2. train-step A/B: encoder_fuse (encoder+prenet+dp kernels) off vs on,
  3. batch-1 inference RTF A/B: fused inverse block off vs on.

Usage:  python scripts/tpu-validate-kernels.py [--skip-tests]
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


if __name__ == "__main__":
    rc = 0
    if "--skip-tests" not in sys.argv:
        rc = run_tests()
    if "--skip-ab" not in sys.argv:
        run_ab()
    sys.exit(rc)
