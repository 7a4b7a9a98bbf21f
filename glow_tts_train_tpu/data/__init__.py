"""Data loading: phoneme CSVs, JSONL / .npy mels, length-bucketed batching."""

from .dataset import (  # noqa: F401
    DataPipeline,
    PhonemeMelDataset,
    collate,
    load_mels,
    load_phonemes,
)
