#!/usr/bin/env python3
"""MAS implementation sweep: scan vs Pallas across the training shape grid.

Interleaved A/B on-device chained timing (the only trustworthy methodology
on the tunneled chip — absolute throughput drifts, but same-process
interleaved ratios hold).  Emits one JSON line per shape:

    {"b": 32, "t_x": 128, "t_y": 640, "scan_ms": ..., "pallas_ms": ...,
     "ratio": scan/pallas}

and a trailing summary line.  Used to set the impl="auto" crossover
(ops/mas.py) and the BASELINE.md record.  MAS only runs in training mode
(gen mode uses predicted durations), so the grid spans training shapes:
batch 8-64, t_x 32-384 phonemes, t_y 128-2600 frames (30s+ utterances).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

# self-contained path setup: do NOT use PYTHONPATH for TPU work here — the
# axon plugin fails to register when PYTHONPATH is set (env quirk)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(impl, b, t_x, t_y, iters, rpc_base):
    import jax
    import jax.numpy as jnp

    from glow_tts_train_tpu.ops import mas

    rng = np.random.default_rng(0)
    logp = jnp.asarray(rng.standard_normal((b, t_x, t_y)), jnp.float32)
    # ragged lengths exercise the masked path like real batches
    t_xs = rng.integers(max(t_x // 2, 1), t_x + 1, size=b)
    t_ys = rng.integers(max(t_y // 2, t_x + 1), t_y + 1, size=b)
    t_xs[0], t_ys[0] = t_x, t_y
    mask = (
        (np.arange(t_x)[None, :, None] < t_xs[:, None, None])
        & (np.arange(t_y)[None, None, :] < t_ys[:, None, None])
    )
    mask = jnp.asarray(mask, jnp.float32)

    @jax.jit
    def chain(logp, mask):
        def body(lp, _):
            p = mas.maximum_path(lp, mask, impl=impl)
            return lp + p * 1e-6, None

        lp, _ = jax.lax.scan(body, logp, None, length=iters)
        return lp

    r = chain(logp, mask)  # compile
    float(r[0, 0, 0])
    best = float("inf")
    for _ in range(3):  # best-of-3 interleave-resistant
        start = time.perf_counter()
        float(chain(logp, mask)[0, 0, 0])
        best = min(best, (time.perf_counter() - start - rpc_base) / iters)
    return best


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

    # rpc baseline
    import jax.numpy as jnp

    triv = jax.jit(lambda x: x + 1.0)
    float(triv(jnp.zeros(())))
    start = time.perf_counter()
    for _ in range(10):
        float(triv(jnp.zeros(())))
    rpc_base = (time.perf_counter() - start) / 10
    print(f"# rpc baseline {rpc_base * 1e3:.2f} ms", file=sys.stderr)

    grid = [
        (8, 32, 128),
        (8, 64, 256),
        (32, 64, 256),
        (32, 128, 640),
        (64, 128, 640),
        (32, 256, 1280),
        (8, 384, 2600),
    ]
    results = []
    for b, t_x, t_y in grid:
        iters = max(4, min(20, int(2e7 / (b * t_y))))
        scan_ms = measure("scan", b, t_x, t_y, iters, rpc_base) * 1e3
        pallas_ms = measure("pallas", b, t_x, t_y, iters, rpc_base) * 1e3
        # second interleaved round to wash out drift
        scan_ms = min(scan_ms, measure("scan", b, t_x, t_y, iters, rpc_base) * 1e3)
        pallas_ms = min(
            pallas_ms, measure("pallas", b, t_x, t_y, iters, rpc_base) * 1e3
        )
        row = {
            "b": b, "t_x": t_x, "t_y": t_y,
            "scan_ms": round(scan_ms, 3),
            "pallas_ms": round(pallas_ms, 3),
            "ratio_scan_over_pallas": round(scan_ms / pallas_ms, 3),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    wins = [r for r in results if r["ratio_scan_over_pallas"] >= 1.2]
    print(
        json.dumps(
            {
                "summary": "pallas_wins_1.2x",
                "shapes": [(r["b"], r["t_x"], r["t_y"]) for r in wins],
                "n_wins": len(wins),
                "n_total": len(results),
            }
        )
    )


if __name__ == "__main__":
    main()
