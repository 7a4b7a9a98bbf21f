#!/usr/bin/env python
"""Round-4c on-chip sweep: base config beyond b=192, large config beyond b=64.

Uses bench.py's two-length chained-difference timing (RPC-jitter-immune).
Prints one JSON line per (config, batch) with frames/s and analytic MFU.
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import bench_train, chip_peak_bf16_flops  # noqa: E402
from glow_tts_train_tpu.config import TrainingConfig  # noqa: E402
from glow_tts_train_tpu.models import hyper_from_config  # noqa: E402
from glow_tts_train_tpu.utils.flops import training_flops  # noqa: E402


def load(name):
    with open(pathlib.Path(__file__).parent.parent / "configs" / name) as f:
        return TrainingConfig.load(f)


def main():
    grid = []
    for name, batches in (
        ("base.json", (192, 224, 256)),
        ("large.json", (64, 96, 128)),
    ):
        cfg = load(name)
        for b in batches:
            try:
                step, fps = bench_train(cfg, b=b, t_x=128, t_y=640)
                fl = training_flops(hyper_from_config(cfg), b, 128, 640)
                peak, _chip = chip_peak_bf16_flops()
                mfu = fl / step / peak
                row = {
                    "config": name,
                    "b": b,
                    "step_ms": round(step * 1e3, 2),
                    "frames_per_sec": round(fps, 1),
                    "mfu": round(mfu, 4),
                }
            except Exception as exc:  # noqa: BLE001
                row = {"config": name, "b": b, "error": repr(exc)[:200]}
            grid.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"sweep": grid}))


if __name__ == "__main__":
    main()
