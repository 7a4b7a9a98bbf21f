#!/usr/bin/env python3
"""Batched synthesis sweep: noise-scale x length-scale grid over a phoneme
CSV (the BASELINE "batched synthesis workload").

Usage:
  scripts/sweep-synthesis.py CHECKPOINT --config CONFIG --csv phonemes.csv \
      --out-dir sweeps/ [--noise-scales 0.0,0.333,0.667] [--length-scales 0.9,1.0,1.1]

Writes one .npy mel per (utterance, noise, length) cell plus a sweep
manifest JSON, and prints per-cell synthesis latency.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser(prog="sweep-synthesis")
    parser.add_argument("checkpoint")
    parser.add_argument("--config", action="append", required=True)
    parser.add_argument("--csv", required=True, help="id|p1 p2 ... phoneme file")
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--noise-scales", default="0.0,0.333,0.667")
    parser.add_argument("--length-scales", default="0.9,1.0,1.1")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--speaker", type=int)
    args = parser.parse_args()

    import numpy as np

    from glow_tts_train_tpu.checkpoint import load_checkpoint
    from glow_tts_train_tpu.config import TrainingConfig
    from glow_tts_train_tpu.infer import build_synthesizer
    from glow_tts_train_tpu.models import store_inverse

    config = TrainingConfig.load_and_merge(TrainingConfig(), args.config)
    ckpt = load_checkpoint(Path(args.checkpoint), config, load_optimizer=False)
    params = store_inverse(ckpt.params)

    utterances = []
    with open(args.csv) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            utt_id, ids = line.split("|", maxsplit=1)
            utterances.append((utt_id, [int(p) for p in ids.split()]))

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    noise_scales = [float(v) for v in args.noise_scales.split(",")]
    length_scales = [float(v) for v in args.length_scales.split(",")]

    manifest = {"cells": [], "checkpoint": str(args.checkpoint)}
    for ns in noise_scales:
        for ls in length_scales:
            synth = build_synthesizer(
                params, config, noise_scale=ns, length_scale=ls
            )
            start = time.perf_counter()
            for i in range(0, len(utterances), args.batch_size):
                chunk = utterances[i : i + args.batch_size]
                mels = synth([ids for _, ids in chunk], speaker=args.speaker)
                for (utt_id, _), mel in zip(chunk, mels):
                    np.save(out_dir / f"{utt_id}_n{ns}_l{ls}.npy", mel)
            elapsed = time.perf_counter() - start
            cell = {
                "noise_scale": ns,
                "length_scale": ls,
                "utterances": len(utterances),
                "seconds": round(elapsed, 3),
            }
            manifest["cells"].append(cell)
            print(json.dumps(cell), flush=True)

    with open(out_dir / "sweep_manifest.json", "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"wrote {len(manifest['cells'])} cells to {out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
