#!/usr/bin/env python3
"""Capture a device trace of the train step and print the op-level budget.

The workflow behind BASELINE.md's round-2 attributions: run N profiled
steps, then aggregate xprof's framework_op_stats by op type and list the
top individual ops.  Requires the xprof / tensorboard-plugin-profile
wheels (present in this image).

Usage:
    python scripts/profile-step.py [B] [T_X] [T_Y] [--trace-dir DIR]

Writes the raw trace under DIR (default /tmp/glow_tts_profile) — loadable
in TensorBoard's profile plugin — and prints the aggregation to stdout.
"""

import argparse
import collections
import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def capture(trace_dir: str, b: int, t_x: int, t_y: int, steps: int = 10):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

    from __graft_entry__ import _base_config, _synthetic_batch
    from glow_tts_train_tpu.training import create_state, make_train_step

    config = _base_config()
    state = create_state(config, jax.random.PRNGKey(0))
    step_fn = make_train_step(config, mesh=None, mas_impl="auto", donate=False)
    batch = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in _synthetic_batch(config, b=b, t_x=t_x, t_y=t_y).items()
    }
    rng = jax.random.key(1, impl=config.prng_impl)

    for i in range(3):  # compile + warm up
        state, m = step_fn(state, batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(m)

    with jax.profiler.trace(trace_dir):
        for i in range(steps):
            state, m = step_fn(state, batch, jax.random.fold_in(rng, 100 + i))
        jax.block_until_ready(m)
    return steps


def report(trace_dir: str, steps: int, top: int = 20):
    from xprof.convert import raw_to_tool_data as rtd

    # repeat runs stack session dirs under trace_dir; the converter chokes
    # on multiple xplanes — take the newest session only
    xplane = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not xplane:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    out, _ = rtd.xspace_to_tool_data(xplane[-1:], "framework_op_stats", {})
    table = json.loads(out.decode() if isinstance(out, bytes) else out)[0]
    cols = [c["id"] for c in table["cols"]]
    i_op = cols.index("operation")
    i_type = cols.index("type")
    i_self = cols.index("total_self_time")
    i_dev = cols.index("host_or_device")

    agg = collections.Counter()
    rows = []
    total = 0.0
    for r in table["rows"]:
        v = [c["v"] for c in r["c"]]
        if v[i_dev] != "Device":
            continue
        agg[v[i_type]] += v[i_self]
        rows.append((v[i_self], v[i_type], v[i_op]))
        total += v[i_self]

    print(f"device self time: {total / steps / 1000:.2f} ms/step")
    print("\nby op type:")
    for typ, us in agg.most_common(top):
        print(f"  {us / steps / 1000:8.3f} ms/step  {100 * us / total:5.1f}%  {typ}")
    print("\ntop individual ops:")
    rows.sort(reverse=True)
    for self_us, typ, op in rows[:top]:
        print(f"  {self_us / steps / 1000:7.3f} ms/step  {typ:<22} ...{op[-70:]}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("b", nargs="?", type=int, default=32)
    parser.add_argument("t_x", nargs="?", type=int, default=128)
    parser.add_argument("t_y", nargs="?", type=int, default=640)
    parser.add_argument("--trace-dir", default="/tmp/glow_tts_profile")
    parser.add_argument("--steps", type=int, default=10)
    args = parser.parse_args()

    steps = capture(args.trace_dir, args.b, args.t_x, args.t_y, args.steps)
    report(args.trace_dir, steps)


if __name__ == "__main__":
    main()
