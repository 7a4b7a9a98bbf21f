"""Configuration dataclasses with JSON overlay merging.

Schema parity with the reference (`/root/reference/glow_tts_train/config.py:11-124`):
same field names, defaults, and nested structure, so existing JSON config files
work unchanged.  Implemented with stdlib ``dataclasses`` only (no
dataclasses-json dependency); TPU-specific knobs live in ``TrainingConfig``
with defaults that keep reference configs valid.
"""

import collections.abc
import dataclasses
import json
import typing
from dataclasses import dataclass, field
from pathlib import Path


def _from_dict(cls, data: typing.Mapping) -> typing.Any:
    """Build a dataclass from a dict, recursing into nested dataclass fields.

    Unknown keys are ignored (tolerant load, like dataclasses_json's default).
    """
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        value = data[f.name]
        if dataclasses.is_dataclass(f.type) and isinstance(value, dict):
            value = _from_dict(f.type, value)
        elif f.name == "betas" and isinstance(value, (list, tuple)):
            value = tuple(value)
        kwargs[f.name] = value
    return cls(**kwargs)


@dataclass
class AudioConfig:
    # Field names/defaults mirror reference config.py:11-32
    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    mel_channels: int = 80
    sample_rate: int = 22050
    sample_bytes: int = 2
    channels: int = 1
    mel_fmin: float = 0.0
    mel_fmax: typing.Optional[float] = 8000.0
    ref_level_db: float = 20.0
    spec_gain: float = 1.0

    # Normalization
    signal_norm: bool = True
    min_level_db: float = -100.0
    max_norm: float = 1.0
    clip_norm: bool = True
    symmetric_norm: bool = True
    do_dynamic_range_compression: bool = True
    convert_db_to_amp: bool = True

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(data: typing.Mapping) -> "AudioConfig":
        return _from_dict(AudioConfig, data)


@dataclass
class ModelConfig:
    # Field names/defaults mirror reference config.py:35-61
    num_symbols: int = 0
    hidden_channels: int = 192
    filter_channels: int = 768
    filter_channels_dp: int = 256
    kernel_size: int = 3
    p_dropout: float = 0.1
    n_blocks_dec: int = 12
    n_layers_enc: int = 6
    n_heads: int = 2
    p_dropout_dec: float = 0.05
    dilation_rate: int = 1
    kernel_size_dec: int = 5
    n_block_layers: int = 4
    n_sqz: int = 2
    prenet: bool = True
    mean_only: bool = True
    hidden_channels_enc: int = 192
    hidden_channels_dec: int = 192
    window_size: int = 4
    n_speakers: int = 1
    n_split: int = 4
    sigmoid_scale: bool = False
    block_length: typing.Optional[int] = None
    gin_channels: int = 0
    n_frames_per_step: int = 1

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(data: typing.Mapping) -> "ModelConfig":
        return _from_dict(ModelConfig, data)


@dataclass
class TrainingConfig:
    # Field names/defaults mirror reference config.py:64-124
    seed: int = 1234
    epochs: int = 10000
    learning_rate: float = 1e0
    betas: typing.Tuple[float, float] = field(default=(0.9, 0.98))
    eps: float = 1e-9
    grad_clip: float = 5.0
    warmup_steps: int = 4000
    scheduler: str = "noam"
    batch_size: int = 32
    fp16_run: bool = False  # reference name; on TPU this enables bf16 compute
    min_seq_length: typing.Optional[int] = None
    max_seq_length: typing.Optional[int] = None
    audio: AudioConfig = field(default_factory=AudioConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    version: int = 1
    git_commit: str = ""

    # --- TPU-native additions (absent fields in old configs keep defaults) ---
    # Length-bucket granularity for static-shape batching (phoneme axis /
    # mel-frame axis).  Coarser buckets => fewer XLA recompiles, more padding.
    bucket_size_text: int = 32
    bucket_size_mel: int = 128
    # Data-parallel mesh axis name.
    mesh_axis: str = "data"
    # Gradient accumulation: split each batch into N microbatches inside
    # the jitted step (lax.scan) and sum their gradients before the
    # optimizer update.  Trains effective batches larger than HBM allows.
    # EXACT: microbatch losses are re-weighted by their frame counts over
    # the whole-batch denominators, so accumulated gradients equal the
    # full-batch gradients to float round-off (tests/test_grad_accum.py);
    # dropout draws per-microbatch streams.  batch_size must divide by it.
    grad_accum_steps: int = 1
    # Iterate encoder layers / flow blocks as an unrolled Python loop (True)
    # or a lax.scan (False).  "auto" -> unrolled wherever the fused Pallas
    # WN kernel is the resolved impl (TPU backends), scan elsewhere.
    # Unroll is what makes residual-store backward win: each block
    # kernel's custom-VJP residuals become independent live values instead
    # of lax.scan outputs that XLA stacks with dynamic_update_slice — the
    # round-3c store-mode loss was those stacking copies, not the residual
    # traffic itself (round-4 A/B on v5e, b=128: scan+store 81.7 ms vs
    # unroll+store 59.0 ms vs round-3 default 70.3 ms).  Cost: ~3.5x
    # compile time (12 statically-indexed block kernels instead of one
    # scanned body); the persistent compilation cache absorbs it across
    # runs.  Explicit True/False wins.
    unroll_blocks: typing.Union[bool, str] = "auto"
    # Rematerialize flow-block activations in backward (jax.checkpoint):
    # "auto" picks the measured winner for the resolved wn_impl — "none"
    # with the fused Pallas WN (its custom VJP already stores minimal
    # residuals, so block recompute is pure waste: 83.1 vs 93.8 ms at
    # b=128), full-block remat with the XLA WN (recompute beats storing
    # the stack's intermediates: 25.8 vs 29.2 ms at b=32).  Explicit
    # values: True/"full", "xin" (store only k-wide in_layer conv
    # outputs), "dots" (store all conv/matmul outputs), False/"none".
    remat_blocks: typing.Union[bool, str] = "auto"
    # Rematerialize encoder attention layers too. Off by default: measured
    # -2% at b=32 (the encoder stores little), +2% at b=128 even with the
    # "dots" policy (keep conv/matmul outputs, recompute elementwise glue:
    # 74.8 vs 73.3 ms) — storing beats recomputing at base shapes; enable
    # (True/"full" or "dots") for long-t_x or memory-pressure configs.
    remat_encoder: typing.Union[bool, str] = False
    # Checkpoint artifact format: "npz" (single portable file) or "orbax"
    # (directory; async, multi-host-safe, per-shard arrays — use at pod scale).
    checkpoint_format: str = "npz"
    # PRNG implementation for dropout/noise during training. "rbg" uses the
    # TPU hardware generator (~15% faster train step than threefry on v5e);
    # "threefry2x32" gives bit-identical streams across shardings/backends.
    prng_impl: str = "rbg"
    # Batches to prepare (mel loads, collate, H2D transfer) ahead of the
    # device step on a background thread; 0 disables prefetch.
    prefetch_batches: int = 2
    # WN gated-stack implementation inside each coupling block: "auto"
    # resolves to "pallas" on TPU backends — the whole n_block_layers stack
    # as one fused VMEM kernel with a custom-VJP backward (ops/wn_pallas.py;
    # with remat_blocks "none" it is the measured round-3 winner, 986k vs
    # 835k frames/s at b=128 on v5e) — and "xla" (op-by-op, XLA-fused)
    # elsewhere.  The kernel's dropout uses the TPU hardware PRNG, a
    # different stream than the XLA path with the same statistics.
    wn_impl: str = "auto"
    # Backward strategy of the fused WN kernel (pallas only): "recompute"
    # re-runs the stack forward in-kernel (stores nothing between fwd and
    # bwd); "store" saves per-layer inputs + gate activations to HBM in
    # forward so backward skips the recompute pass (2x- vs 3x-forward
    # FLOPs, at 3·L·t·h extra bytes per sample per block).  "auto" ->
    # "store" when the blocks are unrolled (the round-4 measured winner:
    # 59.0 vs 70.3 ms at b=128 on v5e — backward drops to the 4 essential
    # matmuls per layer and the residuals ride HBM once each way),
    # "recompute" under lax.scan (store's residuals would become stacked
    # scan outputs: 81.7 ms at b=128 — the round-3c regression).
    wn_residuals: str = "auto"
    # Fuse each entire training-forward flow block (folded actnorm∘invconv
    # matmul + start/end 1x1 convs + WN stack + affine coupling + logdet
    # reduction) into one Pallas kernel (ops/block_pallas.py) instead of
    # running the non-WN pieces as separate XLA ops.  "auto" -> fused
    # wherever the Pallas WN kernel is the resolved impl (TPU backends);
    # the kernel honors wn_residuals in both modes (in-kernel recompute,
    # or the round-4 store backward that saves zp/skipm/xs/th/sg and
    # pairs with unrolled blocks).  True/False force.  DDI always uses
    # the op-by-op path, and export forces it for multi-platform
    # artifacts.
    flow_block_fuse: typing.Union[bool, str] = "auto"
    # Independent control of the INVERSE (inference) block kernel:
    # "auto" follows the resolved wn_impl (the fused inverse block stays
    # the serving winner regardless of the training-forward strategy);
    # True/False force just the reverse direction (serving operators can
    # pin the op-by-op inverse without touching the training path).
    flow_block_fuse_reverse: typing.Union[bool, str] = "auto"
    # Fuse the text side: each entire encoder layer (windowed rel-pos MHA +
    # dropout + residual layernorm + conv-FFN + residual layernorm) as one
    # Pallas VMEM kernel (ops/encoder_pallas.py), plus the ConvReluNorm
    # prenet and the duration-predictor conv stack as one kernel each
    # (ops/text_pallas.py).  The layer is ~30 tiny XLA ops
    # whose dispatch/relayout overhead dominates the encoder's step share;
    # the kernel replaces the reference's [t, 2t-1] rel-pos pad/reshape
    # dance with a banded-diagonal add.  "auto" follows the resolved
    # wn_impl (fused on TPU) when the model uses the kernel-supported
    # encoder configuration (window_size set, no block_length — the only
    # configuration the reference ships); True/False force.
    encoder_fuse: typing.Union[bool, str] = "auto"
    # Host-RAM budget for lazily-loaded .npy mels, in total cached frames
    # (bytes ~= frames * mel_channels * 4).  The reference caches every mel
    # forever (dataset.py:56-59) — several GB of monotonic growth at
    # LJSpeech scale.  Least-recently-used mels are evicted past the
    # budget; 0 disables caching (OS page cache still serves re-reads);
    # -1 restores the reference's unbounded behavior.
    mel_cache_frames: int = 500_000
    # Scoped-VMEM stack limit (KiB) passed to the TPU compiler for the
    # train step.  The fused block kernel's backward stashes per-layer WN
    # values in VMEM scratch; past ~650 squeezed frames that plus the
    # weight-grad accumulators exceeds the compiler's 16 MiB default stack
    # budget and long-utterance buckets fail to compile (observed at
    # t_y=1408 on v5e: 17.23 MiB needed).  64 MiB covers ~60 s utterances
    # with VMEM to spare (v5e has 128 MiB).  0 keeps the compiler default.
    scoped_vmem_limit_kib: int = 65536

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["betas"] = list(self.betas)
        return d

    @staticmethod
    def from_dict(data: typing.Mapping) -> "TrainingConfig":
        return _from_dict(TrainingConfig, data)

    def save(self, config_file: typing.TextIO) -> None:
        """Save config as JSON to a file (reference config.py:83-85)."""
        json.dump(self.to_dict(), config_file, indent=4)

    @staticmethod
    def load(config_file: typing.TextIO) -> "TrainingConfig":
        """Load config from a JSON file (reference config.py:87-90)."""
        return TrainingConfig.from_dict(json.load(config_file))

    @staticmethod
    def load_and_merge(
        config: "TrainingConfig",
        config_files: typing.Iterable[typing.Union[str, Path, typing.TextIO]],
    ) -> "TrainingConfig":
        """Overlay one or more JSON config files onto an existing config
        (reference config.py:92-112)."""
        base_dict = config.to_dict()
        for maybe_config_file in config_files:
            if isinstance(maybe_config_file, (str, Path)):
                config_file = open(maybe_config_file, "r")
            else:
                config_file = maybe_config_file

            with config_file:
                new_dict = json.load(config_file)
                TrainingConfig.recursive_update(base_dict, new_dict)

        return TrainingConfig.from_dict(base_dict)

    @staticmethod
    def recursive_update(
        base_dict: typing.Dict[typing.Any, typing.Any],
        new_dict: typing.Mapping[typing.Any, typing.Any],
    ) -> None:
        """Recursively overwrite values in ``base_dict`` with ``new_dict``
        (reference config.py:114-124; uses collections.abc so it works on
        modern Python)."""
        for k, v in new_dict.items():
            if isinstance(v, collections.abc.Mapping) and (
                base_dict.get(k) is not None
            ):
                TrainingConfig.recursive_update(base_dict[k], v)
            else:
                base_dict[k] = v
