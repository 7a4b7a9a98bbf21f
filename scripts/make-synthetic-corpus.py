#!/usr/bin/env python3
"""Generate a realistic LJSpeech-scale stand-in corpus on disk.

No speech corpus ships in this environment, so end-to-end training evidence
uses a synthetic corpus built to exercise the real data path the way
LJSpeech does (reference workflow: __main__.py:144-220):

* a few hundred utterances, CSV phonemes + per-utterance ``.npy`` mels
* variable lengths: 30-180 phonemes, ~4-10 s of frames at hop 256/22050 Hz
* real log-mel statistics: per-channel means/ranges shaped like a speech
  spectral envelope (energy concentrated in low mel bands, floor ~-11.5,
  peaks ~2 — LJSpeech-like log-mel range), temporally smooth
* mels are genuinely PREDICTABLE from the phonemes: each phoneme has a
  stable spectral template and a duration drawn per-utterance, so both the
  flow NLL and the duration predictor have real structure to learn

Usage: python scripts/make-synthetic-corpus.py OUT_DIR [n_utts] [seed]
"""

import json
import sys
from pathlib import Path

import numpy as np

N_MELS = 80
N_SYMBOLS = 44  # gruut-like phoneme inventory incl. pad/silence
HOP_SECONDS = 256 / 22050


def phoneme_templates(rng: np.random.Generator) -> np.ndarray:
    """[n_symbols, n_mels] log-mel spectral template per phoneme."""
    mel_axis = np.linspace(0.0, 1.0, N_MELS)
    templates = np.zeros((N_SYMBOLS, N_MELS), np.float32)
    for p in range(N_SYMBOLS):
        # 2-4 formant-like bumps over a tilted floor
        n_bumps = int(rng.integers(2, 5))
        centers = rng.uniform(0.0, 0.9, size=n_bumps)
        widths = rng.uniform(0.02, 0.12, size=n_bumps)
        gains = rng.uniform(3.0, 8.0, size=n_bumps)
        env = -9.0 - 3.0 * mel_axis  # spectral tilt: less energy up high
        for c, w, g in zip(centers, widths, gains):
            env = env + g * np.exp(-0.5 * ((mel_axis - c) / w) ** 2)
        templates[p] = env
    return np.clip(templates, -11.5, 2.0)


def render_utterance(rng, templates, phonemes: np.ndarray) -> np.ndarray:
    """Expand phonemes to frames with per-phoneme durations + smoothing."""
    durations = rng.integers(3, 13, size=len(phonemes))  # frames per phoneme
    frames = np.repeat(templates[phonemes], durations, axis=0)  # [t, n_mels]
    # temporal smoothing (coarticulation) + slowly-varying gain + noise
    kernel = np.asarray([0.15, 0.7, 0.15])
    padded = np.pad(frames, ((1, 1), (0, 0)), mode="edge")
    smooth = (
        kernel[0] * padded[:-2] + kernel[1] * padded[1:-1] + kernel[2] * padded[2:]
    )
    t = smooth.shape[0]
    gain = 0.5 * np.sin(np.linspace(0, rng.uniform(2, 6), t))[:, None]
    noisy = smooth + gain + rng.normal(0.0, 0.15, size=smooth.shape)
    return np.clip(noisy, -11.5, 2.0).astype(np.float32).T  # [n_mels, t]


def main():
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("corpus")
    n_utts = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 1234

    rng = np.random.default_rng(seed)
    templates = phoneme_templates(rng)
    mels_dir = out_dir / "mels"
    mels_dir.mkdir(parents=True, exist_ok=True)

    stats = []
    with open(out_dir / "phonemes.csv", "w") as csv_file:
        for i in range(n_utts):
            utt_id = f"synth-{i:04d}"
            n_ph = int(rng.integers(30, 181))
            phonemes = rng.integers(1, N_SYMBOLS, size=n_ph)
            mel = render_utterance(rng, templates, phonemes)
            np.save(mels_dir / f"{utt_id}.npy", mel)
            csv_file.write(f"{utt_id}|{' '.join(map(str, phonemes))}\n")
            stats.append((n_ph, mel.shape[1]))

    lengths = np.asarray(stats)
    manifest = {
        "n_utterances": n_utts,
        "n_mels": N_MELS,
        "num_symbols": N_SYMBOLS,
        "phonemes_min_max": [int(lengths[:, 0].min()), int(lengths[:, 0].max())],
        "frames_min_max": [int(lengths[:, 1].min()), int(lengths[:, 1].max())],
        "total_audio_seconds": float(lengths[:, 1].sum() * HOP_SECONDS),
        "seed": seed,
    }
    with open(out_dir / "manifest.json", "w") as mf:
        json.dump(manifest, mf, indent=2)
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
