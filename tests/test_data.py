"""Dataset loading + collate golden tests (reference dataset.py semantics)."""

import io
import json

import numpy as np

from glow_tts_train_tpu.config import TrainingConfig
from glow_tts_train_tpu.data import (
    DataPipeline,
    PhonemeMelDataset,
    collate,
    load_mels,
    load_phonemes,
)


def test_load_phonemes_filtering():
    config = TrainingConfig(min_seq_length=2, max_seq_length=4)
    csv_data = "a|1 2 3\nb|7\nc|1 2 3 4 5 6\nd|4 5\n"
    phonemes = load_phonemes(io.StringIO(csv_data), config)
    assert set(phonemes) == {"a", "d"}
    np.testing.assert_array_equal(phonemes["a"], [1, 2, 3])


def test_load_mels_jsonl():
    lines = [
        json.dumps({"id": "u1", "mel": [[1.0, 2.0], [3.0, 4.0]]}),
        "",
        json.dumps({"id": "u2", "mel": [[5.0], [6.0]]}),
    ]
    mels = load_mels(io.StringIO("\n".join(lines)))
    assert mels["u1"].shape == (2, 2)
    assert mels["u2"].shape == (2, 1)


def make_items():
    rng = np.random.default_rng(0)
    return [
        (np.arange(1, 6, dtype=np.int32), rng.standard_normal((4, 11)).astype(np.float32), 0),
        (np.arange(1, 9, dtype=np.int32), rng.standard_normal((4, 17)).astype(np.float32), 1),
        (np.arange(1, 3, dtype=np.int32), rng.standard_normal((4, 5)).astype(np.float32), 0),
    ]


def test_collate_sorting_and_padding():
    items = make_items()
    batch = collate(items, n_frames_per_step=2)
    # sorted by text length descending (dataset.py:79-81)
    np.testing.assert_array_equal(batch["x_lengths"], [8, 5, 2])
    np.testing.assert_array_equal(batch["y_lengths"], [17, 11, 5])
    # mel frames rounded up to n_frames_per_step (dataset.py:93-97)
    assert batch["y"].shape == (3, 18, 4)
    # zero padding + channels-last transpose
    assert batch["x"][2, 2:].sum() == 0
    np.testing.assert_allclose(batch["y"][0, :17], items[1][1].T)
    assert np.all(batch["y"][0, 17:] == 0)
    assert "speaker_ids" not in batch


def test_collate_buckets_and_speakers():
    batch = collate(
        make_items(), multispeaker=True, bucket_size_text=16, bucket_size_mel=32
    )
    assert batch["x"].shape == (3, 16)
    assert batch["y"].shape[1] == 32
    np.testing.assert_array_equal(batch["speaker_ids"], [1, 0, 0])


def make_dataset(n=10):
    rng = np.random.default_rng(1)
    id_phonemes = {}
    id_mels = {}
    for i in range(n):
        key = (0, f"utt{i:03d}")
        id_phonemes[key] = rng.integers(1, 20, size=rng.integers(3, 9)).astype(np.int32)
        id_mels[key] = rng.standard_normal((4, int(rng.integers(8, 30)))).astype(
            np.float32
        )
    return PhonemeMelDataset(id_phonemes, id_mels)


def test_pipeline_epochs_and_sharding():
    dataset = make_dataset(10)
    config = TrainingConfig(batch_size=2, bucket_size_text=4, bucket_size_mel=8)
    pipeline = DataPipeline(dataset, config, drop_last=True)
    batches = list(pipeline.batches())
    assert len(batches) == 5
    for b in batches:
        assert b["x"].shape[0] == 2
        assert b["x"].shape[1] % 4 == 0
        assert b["y"].shape[1] % 8 == 0

    # reshuffles across epochs
    order1 = [b["x_lengths"].tolist() for b in batches]
    order2 = [b["x_lengths"].tolist() for b in pipeline.batches()]
    assert order1 != order2 or len(order1) <= 1

    # host sharding partitions the data
    p0 = DataPipeline(dataset, config, num_shards=2, shard_index=0, drop_last=False)
    p1 = DataPipeline(dataset, config, num_shards=2, shard_index=1, drop_last=False)
    n0 = sum(b["x"].shape[0] for b in p0.batches())
    n1 = sum(b["x"].shape[0] for b in p1.batches())
    assert n0 + n1 == 10


def test_lazy_npy_loading(tmp_path):
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((4, 9)).astype(np.float32)
    np.save(tmp_path / "uttx.npy", mel)
    dataset = PhonemeMelDataset(
        {(0, "uttx"): np.asarray([1, 2, 3], np.int32)},
        {},
        mel_dirs={0: tmp_path},
    )
    text, loaded, speaker = dataset.get((0, "uttx"))
    np.testing.assert_allclose(loaded, mel)
    assert (0, "uttx") in dataset.id_mels  # cached


def test_mel_length_reads_npy_header_without_loading(tmp_path):
    """Length-bucketing must not pull the corpus into RAM (npy header read)."""
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((4, 23)).astype(np.float32)
    np.save(tmp_path / "utth.npy", mel)
    from glow_tts_train_tpu.data.dataset import PhonemeMelDataset

    ds = PhonemeMelDataset(
        {(0, "utth"): np.asarray([1, 2], np.int32)}, {}, mel_dirs={0: tmp_path}
    )
    assert ds.mel_length((0, "utth")) == 23
    assert (0, "utth") not in ds.id_mels  # data NOT loaded
    assert ds.mel_length((0, "utth")) == 23  # cached length path


def test_sharding_equal_batch_counts():
    """Every host must see the same number of batches (pod deadlock guard)."""
    from glow_tts_train_tpu.data import DataPipeline

    dataset = make_dataset(127 % 100 + 27)  # 54 utterances
    config = TrainingConfig(batch_size=8, bucket_size_text=4, bucket_size_mel=8)
    counts = []
    for shard in range(4):
        p = DataPipeline(
            dataset, config, num_shards=4, shard_index=shard, drop_last=True
        )
        counts.append(sum(1 for _ in p.batches()))
    assert len(set(counts)) == 1, counts
