#!/usr/bin/env python3
"""Benchmark harness: Glow-TTS base training throughput on one chip.

Prints ONE JSON line:
  {"metric": "train_mel_frames_per_sec_per_chip", "value": N,
   "unit": "frames/sec", "vs_baseline": null, ...}

The reference publishes no numbers (BASELINE.md) — vs_baseline is null and
this harness *is* the baseline record.  Extra context fields (step_time_ms,
inference RTF, MAS latency) ride along for BENCH_r{N}.json history.
"""

import json
import sys
import time

import numpy as np


def bench_train(config, b=32, t_x=128, t_y=640, warmup=3, iters=10, mas_impl="scan"):
    import jax

    from glow_tts_train_tpu.training import create_state, make_train_step

    from __graft_entry__ import _synthetic_batch

    print(f"bench_train: init (b={b}, t_x={t_x}, t_y={t_y})", file=sys.stderr, flush=True)
    state = create_state(config, jax.random.PRNGKey(0))
    step_fn = make_train_step(config, mesh=None, mas_impl=mas_impl, donate=True)
    batch = _synthetic_batch(config, b=b, t_x=t_x, t_y=t_y)
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(1)

    print("bench_train: compiling + warmup...", file=sys.stderr, flush=True)
    for _ in range(warmup):
        state, metrics = step_fn(state, batch, rng)
    # fetch a scalar: block_until_ready alone can be a no-op on tunneled
    # backends; a concrete host value cannot be
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss

    print("bench_train: timing...", file=sys.stderr, flush=True)
    start = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, batch, rng)
    loss = float(metrics["loss"])
    elapsed = time.perf_counter() - start
    assert np.isfinite(loss), loss

    step_time = elapsed / iters
    frames_per_sec = b * t_y / step_time
    return step_time, frames_per_sec


def bench_infer_rtf(config, t_x=128, y_max=1024, warmup=2, iters=10):
    """Batch-1 inference real-time factor at 22050 Hz / hop 256."""
    import jax
    import jax.numpy as jnp

    from glow_tts_train_tpu.models import (
        forward_gen,
        hyper_from_config,
        init_model,
        store_inverse,
    )

    hp = hyper_from_config(config)
    params = store_inverse(init_model(jax.random.PRNGKey(0), hp))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, config.model.num_symbols, (1, t_x)), jnp.int32)
    x_lengths = jnp.asarray([t_x], jnp.int32)

    @jax.jit
    def gen(params, x, x_lengths, key):
        out = forward_gen(
            params, hp, x, x_lengths, y_max_length=y_max,
            noise_rng=key, noise_scale=0.333,
        )
        return out[0][0], out[3]

    key = jax.random.PRNGKey(2)
    for _ in range(warmup):
        y, y_lengths = gen(params, x, x_lengths, key)
    float(y[0, 0, 0])

    start = time.perf_counter()
    for _ in range(iters):
        y, y_lengths = gen(params, x, x_lengths, key)
    float(y[0, 0, 0])
    elapsed = (time.perf_counter() - start) / iters

    frames = float(np.asarray(y_lengths)[0])
    audio_seconds = frames * config.audio.hop_length / config.audio.sample_rate
    return elapsed / max(audio_seconds, 1e-9), elapsed, frames


def bench_mas(b=32, t_x=128, t_y=640, warmup=2, iters=10, impl="scan"):
    import jax
    import jax.numpy as jnp

    from glow_tts_train_tpu.ops import mas

    rng = np.random.default_rng(0)
    logp = jnp.asarray(rng.standard_normal((b, t_x, t_y)), jnp.float32)
    mask = jnp.ones((b, t_x, t_y), jnp.float32)

    for _ in range(warmup):
        p = mas.maximum_path(logp, mask, impl=impl)
    float(p[0, 0, 0])
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        p = mas.maximum_path(logp, mask, impl=impl)
        float(p[0, 0, 0])
        times.append(time.perf_counter() - start)
    return float(np.percentile(times, 50))


def main():
    import jax

    # persistent compilation cache: repeat bench runs skip the big compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _base_config

    config = _base_config()  # Glow-TTS base, bf16

    step_time, frames_per_sec = bench_train(config)
    rtf, infer_time, infer_frames = bench_infer_rtf(config)
    mas_p50 = bench_mas(impl="scan")
    try:
        mas_pallas_p50 = round(bench_mas(impl="pallas") * 1e3, 2)
    except Exception as exc:  # keep the bench line even if the kernel fails
        mas_pallas_p50 = f"error: {type(exc).__name__}"

    result = {
        "metric": "train_mel_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec",
        "vs_baseline": None,  # reference publishes no numbers (BASELINE.md)
        "extras": {
            "train_step_time_ms": round(step_time * 1e3, 2),
            "train_batch": 32,
            "train_frames_per_batch": 32 * 640,
            "infer_rtf_batch1": round(rtf, 5),
            "infer_time_s": round(infer_time, 4),
            "infer_frames": infer_frames,
            "mas_p50_ms_b32_128x640": round(mas_p50 * 1e3, 2),
            "mas_pallas_p50_ms_b32_128x640": mas_pallas_p50,
            "precision": "bf16 compute / fp32 params",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
