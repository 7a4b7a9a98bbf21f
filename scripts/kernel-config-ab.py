#!/usr/bin/env python3
"""Generic interleaved A/B of train-step config overrides on the attached chip.

Usage:
    python scripts/kernel-config-ab.py \
        --variant base \
        --variant store='{"flow_block_fuse": false, "wn_residuals": "store", "unroll_blocks": true}' \
        --b 128 192

Each variant is NAME or NAME=JSON-dict of TrainingConfig field overrides
applied on top of the base bench config.  Variants run interleaved
(A/B/A/B per pass) with bench.py's RPC-jitter-immune two-length chain
timing, so day-to-day tunnel drift cancels; best-of-passes per
(variant, b) is reported.
"""

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", action="append", required=True)
    parser.add_argument("--b", type=int, nargs="*", default=[128])
    parser.add_argument("--passes", type=int, default=2)
    args = parser.parse_args()

    variants = {}
    for spec in args.variant:
        name, _, overrides = spec.partition("=")
        variants[name] = json.loads(overrides) if overrides else {}

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _base_config
    from bench import bench_train

    base = _base_config()
    results = {}
    for _pass in range(args.passes):
        for b in args.b:
            for name, overrides in variants.items():
                config = dataclasses.replace(base, **overrides)
                step_time, fps = bench_train(config, b=b)
                key = (name, b)
                prev = results.get(key)
                if prev is None or step_time < prev[0]:
                    results[key] = (step_time, fps)
                print(
                    f"pass {_pass} b={b} {name}: "
                    f"{step_time * 1e3:.2f} ms/step, {fps:,.0f} frames/s",
                    flush=True,
                )

    print("\nbest-of-passes:")
    for (name, b), (step_time, fps) in sorted(
        results.items(), key=lambda kv: (kv[0][1], kv[1][0])
    ):
        print(f"  b={b:<4} {name:<16} {step_time * 1e3:8.2f} ms  {fps:12,.0f} f/s")


if __name__ == "__main__":
    main()
