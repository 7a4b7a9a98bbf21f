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

    # host sharding partitions the data evenly: 10 utterances, global batch
    # 2*2=4 -> 2 full global batches, 2 leftover dropped (multi-host always
    # drops partials — they can't split evenly across hosts)
    p0 = DataPipeline(dataset, config, num_shards=2, shard_index=0, drop_last=False)
    p1 = DataPipeline(dataset, config, num_shards=2, shard_index=1, drop_last=False)
    n0 = sum(b["x"].shape[0] for b in p0.batches())
    n1 = sum(b["x"].shape[0] for b in p1.batches())
    assert n0 == n1 == 4


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
    assert (0, "uttx") in dataset._mel_cache  # cached (LRU, not id_mels)


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


def test_multihost_identical_shapes_per_step():
    """All hosts must produce the IDENTICAL (t_x, t_y) sequence each epoch —
    a shape disagreement in any step hangs the pod's all-reduce."""
    dataset = make_dataset(37)
    config = TrainingConfig(batch_size=2, bucket_size_text=1, bucket_size_mel=1)
    shapes_per_shard = []
    rows_per_shard = []
    for shard in range(4):
        p = DataPipeline(dataset, config, num_shards=4, shard_index=shard)
        batches = list(p.batches())
        shapes_per_shard.append(
            [(b["x"].shape[1], b["y"].shape[1]) for b in batches]
        )
        rows_per_shard.append(sum(b["x"].shape[0] for b in batches))
    assert len(shapes_per_shard[0]) == 37 // (2 * 4)
    for other in shapes_per_shard[1:]:
        assert other == shapes_per_shard[0]
    assert len(set(rows_per_shard)) == 1


def test_drop_last_rotates_across_epochs():
    """drop_last must not permanently exclude a fixed subset (previously the
    longest-mel utterances were dropped every epoch)."""
    dataset = make_dataset(11)  # batch 2 -> 1 utterance dropped per epoch
    config = TrainingConfig(batch_size=2, bucket_size_text=1, bucket_size_mel=1)
    pipeline = DataPipeline(dataset, config, drop_last=True)
    lengths = sorted(dataset.mel_length(k) for k in dataset.ids)
    seen_counts = []
    for _ in range(8):
        seen = sum(b["y_lengths"].shape[0] for b in pipeline.batches())
        assert seen == 10
        seen_counts.append(seen)
    # across epochs the dropped utterance varies: collect per-epoch total
    # mel-frame sums — if the same utterance were always dropped they would
    # cover a single value set; with rotation the longest utterance appears
    # in at least one epoch
    longest = lengths[-1]
    appeared = False
    for _ in range(8):
        for b in pipeline.batches():
            if longest in b["y_lengths"].tolist():
                appeared = True
    assert appeared, "longest utterance never trained on in 8 epochs"


def test_corpus_build_dataset_and_num_symbols(tmp_path):
    import pytest

    from glow_tts_train_tpu.data import (
        MissingMelsError,
        SpeakerSource,
        build_dataset,
        detect_num_symbols,
    )

    rng = np.random.default_rng(3)
    # speaker 0: JSONL mels; speaker 1: .npy dir with one missing mel
    (tmp_path / "s0.csv").write_text("a|1 2 3\nb|4 5\n")
    with open(tmp_path / "s0.jsonl", "w") as f:
        for utt in ("a", "b"):
            f.write(
                json.dumps(
                    {"id": utt, "mel": rng.standard_normal((4, 6)).tolist()}
                )
                + "\n"
            )
    (tmp_path / "s1.csv").write_text("c|7 8\nd|9 11\n")
    npy_dir = tmp_path / "s1_mels"
    npy_dir.mkdir()
    np.save(npy_dir / "c.npy", rng.standard_normal((4, 7)).astype(np.float32))

    config = TrainingConfig()
    config.audio.mel_channels = 4  # match the test mels (channel check)
    sources = [
        SpeakerSource(0, tmp_path / "s0.csv", tmp_path / "s0.jsonl"),
        SpeakerSource(1, tmp_path / "s1.csv", npy_dir),
    ]
    # JSONL-only assembly works standalone
    ds0 = build_dataset(sources[:1], config)
    assert set(ds0.ids) == {(0, "a"), (0, "b")}
    assert not ds0.multispeaker

    # missing .npy dies loudly unless skipping is requested
    with pytest.raises(MissingMelsError, match="speaker 1"):
        build_dataset(sources[1:], config, mels_are_dirs=True)

    # mixed corpus: JSONL speaker keeps eager mels, dir speaker streams
    # (note: mels_are_dirs applies per-run like the reference's --mels-dir,
    # so rebuild speaker 0 alone eagerly and merge-check speaker 1 lazily)
    ds1 = build_dataset(
        sources[1:], config, mels_are_dirs=True, skip_missing_mels=True
    )
    assert set(ds1.ids) == {(1, "c")}
    text, mel, speaker = ds1.get((1, "c"))
    assert mel.shape == (4, 7) and speaker == 1
    assert detect_num_symbols(ds1) == 9
    assert detect_num_symbols(ds0) == 6


def test_build_dataset_rejects_mel_channel_mismatch(tmp_path):
    """Wrong audio.mel_channels vs the corpus must fail at dataset build
    with a clear message, not steps later as an einsum shape error deep
    inside jit tracing.  Both JSONL and .npy-directory sources."""
    import json as _json

    import pytest

    from glow_tts_train_tpu.data import SpeakerSource, build_dataset
    from helpers import tiny_config

    config = tiny_config()  # audio.mel_channels == 8
    rng = np.random.default_rng(0)

    csv = tmp_path / "phonemes.csv"
    csv.write_text("u0|3 5 7\nu1|2 4\n")

    jsonl = tmp_path / "mels.jsonl"
    with open(jsonl, "w") as f:
        for u in ("u0", "u1"):
            f.write(_json.dumps(
                {"id": u, "mel": rng.standard_normal((16, 12)).tolist()}
            ) + "\n")
    with pytest.raises(ValueError, match="16 channels.*mel_channels=8"):
        build_dataset([SpeakerSource(0, csv, jsonl)], config)

    mels_dir = tmp_path / "mels"
    mels_dir.mkdir()
    for u in ("u0", "u1"):
        np.save(mels_dir / f"{u}.npy", rng.standard_normal((16, 12)).astype(np.float32))
    with pytest.raises(ValueError, match="16 channels.*mel_channels=8"):
        build_dataset(
            [SpeakerSource(0, csv, mels_dir)], config, mels_are_dirs=True
        )


def test_mel_cache_lru_bound(tmp_path):
    """Lazily-loaded .npy mels are cached LRU under a frames budget — the
    reference caches every mel forever, several GB at LJSpeech scale."""
    from glow_tts_train_tpu.data.dataset import PhonemeMelDataset

    rng = np.random.default_rng(0)
    mels_dir = tmp_path / "mels"
    mels_dir.mkdir()
    phonemes = {}
    for i in range(6):
        key = (0, f"u{i}")
        phonemes[key] = np.asarray([1, 2, 3], np.int32)
        np.save(mels_dir / f"u{i}.npy", rng.standard_normal((4, 10)).astype(np.float32))

    ds = PhonemeMelDataset(phonemes, {}, {0: mels_dir}, cache_frames=25)
    for i in range(6):
        ds.get((0, f"u{i}"))
    # 10 frames each, budget 25 -> at most 2 cached (3rd insert evicts)
    assert len(ds._mel_cache) == 2
    assert ds._cached_frames == 20
    # LRU order: most recent survive
    assert set(ds._mel_cache) == {(0, "u4"), (0, "u5")}
    # re-get refreshes recency
    ds.get((0, "u4"))
    ds.get((0, "u0"))
    assert set(ds._mel_cache) == {(0, "u4"), (0, "u0")}

    # cache_frames=0 disables caching entirely
    ds0 = PhonemeMelDataset(phonemes, {}, {0: mels_dir}, cache_frames=0)
    ds0.get((0, "u0"))
    assert len(ds0._mel_cache) == 0

    # -1 keeps everything (reference behavior)
    dsu = PhonemeMelDataset(phonemes, {}, {0: mels_dir}, cache_frames=-1)
    for i in range(6):
        dsu.get((0, f"u{i}"))
    assert len(dsu._mel_cache) == 6

    # loads are identical regardless of cache policy
    np.testing.assert_array_equal(ds.get((0, "u1"))[1], dsu.get((0, "u1"))[1])


def test_build_dataset_rejects_mixed_mel_channels(tmp_path):
    """A partially regenerated corpus (one good mel, one with the wrong
    channel count) must fail at build: the channel check samples several
    utterances per source, not a single representative."""
    import pytest

    from glow_tts_train_tpu.data import SpeakerSource, build_dataset
    from helpers import tiny_config

    config = tiny_config()  # audio.mel_channels == 8
    rng = np.random.default_rng(0)

    csv = tmp_path / "phonemes.csv"
    csv.write_text("u0|3 5 7\nu1|2 4\n")
    mels_dir = tmp_path / "mels"
    mels_dir.mkdir()
    np.save(mels_dir / "u0.npy", rng.standard_normal((8, 12)).astype(np.float32))
    np.save(mels_dir / "u1.npy", rng.standard_normal((16, 12)).astype(np.float32))
    with pytest.raises(ValueError, match="u1.*16 channels.*mel_channels=8"):
        build_dataset(
            [SpeakerSource(0, csv, mels_dir)], config, mels_are_dirs=True
        )


def test_build_dataset_rejects_negative_phoneme_ids(tmp_path):
    """Negative ids wrap/clamp in the embedding gather just as silently as
    too-large ones — the range check must catch both ends."""
    import json as _json

    import pytest

    from glow_tts_train_tpu.data import SpeakerSource, build_dataset
    from helpers import tiny_config

    config = tiny_config()  # num_symbols == 20
    csv = tmp_path / "phonemes.csv"
    csv.write_text("u0|3 -1 7\n")
    jsonl = tmp_path / "mels.jsonl"
    with open(jsonl, "w") as f:
        f.write(_json.dumps({"id": "u0", "mel": [[0.0] * 12] * 8}) + "\n")
    with pytest.raises(ValueError, match="phoneme id -1"):
        build_dataset([SpeakerSource(0, csv, jsonl)], config)


def test_epoch_shapes_match_actual_batches(tmp_path):
    """epoch_shapes() predicts exactly the collated shapes the epoch
    produces, from metadata alone (no mel loads) — the contract the train
    loop's shape precompilation relies on."""
    import dataclasses

    from glow_tts_train_tpu.data.dataset import DataPipeline, PhonemeMelDataset
    from helpers import tiny_config

    rng = np.random.default_rng(0)
    mels_dir = tmp_path / "mels"
    mels_dir.mkdir()
    phonemes, mels = {}, {}
    for i in range(24):
        key = (0, f"u{i}")
        n = int(rng.integers(3, 12))
        phonemes[key] = rng.integers(1, 9, size=n).astype(np.int32)
        t = int(rng.integers(8, 40))
        np.save(mels_dir / f"u{i}.npy", rng.standard_normal((8, t)).astype(np.float32))

    config = dataclasses.replace(
        tiny_config(), batch_size=4, bucket_size_text=4, bucket_size_mel=8
    )
    ds = PhonemeMelDataset(phonemes, {}, {0: mels_dir})
    pipeline = DataPipeline(ds, config, bucket_by_length=True)

    predicted = pipeline.epoch_shapes()
    actual = sorted(
        {
            (b["x"].shape[0], b["x"].shape[1], b["y"].shape[1])
            for b in pipeline.batches()
        }
    )
    assert predicted == actual, (predicted, actual)
    # peeking at shapes must not consume the epoch counter
    pipeline2 = DataPipeline(ds, config, bucket_by_length=True)
    pipeline2.epoch_shapes()
    assert pipeline2.epoch == 0
