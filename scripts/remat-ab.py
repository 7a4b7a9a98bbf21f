#!/usr/bin/env python3
"""A/B the flow-block remat policies on the attached chip.

Usage: python scripts/remat-ab.py [policies ...] [--b N ...]

Times the full train step per policy at each batch size with the
RPC-jitter-immune two-length chain method (bench.py), interleaved A/B/A/B
so tunnel drift cancels.  Policies: full, xin, dots, none.
"""

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("policies", nargs="*", default=None)
    parser.add_argument("--b", type=int, nargs="*", default=[32, 128])
    parser.add_argument("--passes", type=int, default=2)
    args = parser.parse_args()
    policies = args.policies or ["full", "xin"]

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _base_config
    from bench import bench_train

    results = {}
    for _pass in range(args.passes):
        for b in args.b:
            for pol in policies:
                config = dataclasses.replace(
                    _base_config(), remat_blocks=(True if pol == "full" else pol)
                )
                step_time, fps = bench_train(config, b=b)
                key = (pol, b)
                prev = results.get(key)
                if prev is None or step_time < prev[0]:
                    results[key] = (step_time, fps)
                print(
                    f"pass {_pass} b={b} remat={pol}: "
                    f"{step_time * 1e3:.2f} ms/step, {fps:,.0f} frames/s",
                    flush=True,
                )

    print("\nbest-of-passes:")
    for (pol, b), (step_time, fps) in sorted(results.items(), key=lambda kv: kv[0][1]):
        print(f"  b={b:<4} remat={pol:<5} {step_time * 1e3:8.2f} ms  {fps:12,.0f} f/s")


if __name__ == "__main__":
    main()
