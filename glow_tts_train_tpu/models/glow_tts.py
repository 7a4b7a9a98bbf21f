"""Glow-TTS model graph: text encoder + duration predictor + flow decoder.

Behavioral parity with reference `/root/reference/glow_tts_train/models.py`
(`DurationPredictor` :21-51, `TextEncoder` :54-142, `FlowSpecDecoder`
:145-215, `FlowGenerator` :218-409, `setup_model` :417-470), re-designed
TPU-first:

* pure functions over a param pytree; hyperparameters in a hashable
  NamedTuple (`GlowTTSHyper`) usable as a jit static argument
* channels-last [b, t, c] activations
* training forward and generation forward are separate pure functions
  (instead of a ``gen=`` flag) — each jit-compiles to a single XLA program
* MAS runs on device (ops/mas.py); its output is stop_gradient'ed exactly
  like the reference's ``.detach()`` (models.py:378-382)
* generation uses a *static* padded frame budget ``y_max_length`` (XLA needs
  static shapes); callers bucket it from the predicted durations
"""

import math
import typing
from functools import partial

import jax
import jax.numpy as jnp

from ..config import TrainingConfig
from ..ops import mas
from ..ops.attention import (
    dropout,
    encoder_init,
    encoder_apply,
    prenet_init,
    prenet_apply,
)
from ..ops.conv import conv1d, torch_conv_init
from ..ops.flows import (
    DecoderHyper,
    decoder_ddi,
    decoder_fwd,
    decoder_init,
    decoder_inv,
    decoder_store_inverse,
)
from ..ops.masks import generate_path, time_mask
from ..ops.norms import layer_norm, layer_norm_init

Params = typing.Dict[str, typing.Any]


class GlowTTSHyper(typing.NamedTuple):
    """Static model hyperparameters (hashable — safe as a jit static arg).

    Field meanings match FlowGenerator's ctor args (models.py:218-273)."""

    n_vocab: int
    hidden_channels: int
    filter_channels: int
    filter_channels_dp: int
    out_channels: int
    kernel_size: int = 3
    n_heads: int = 2
    n_layers_enc: int = 6
    p_dropout: float = 0.0
    n_blocks_dec: int = 12
    kernel_size_dec: int = 5
    dilation_rate: int = 1
    n_block_layers: int = 4
    p_dropout_dec: float = 0.05
    n_speakers: int = 0
    gin_channels: int = 0
    n_split: int = 4
    n_sqz: int = 2
    sigmoid_scale: bool = False
    window_size: typing.Optional[int] = 4
    block_length: typing.Optional[int] = None
    mean_only: bool = False
    hidden_channels_enc: typing.Optional[int] = None
    hidden_channels_dec: typing.Optional[int] = None
    prenet: bool = False
    unroll: bool = False
    remat: bool = True
    remat_encoder: typing.Union[bool, str] = False
    wn_impl: str = "xla"
    wn_residuals: str = "recompute"
    block_fuse: bool = False
    block_fuse_reverse: bool = False
    encoder_fuse: bool = False

    @property
    def h_enc(self) -> int:
        return self.hidden_channels_enc or self.hidden_channels

    @property
    def h_dec(self) -> int:
        return self.hidden_channels_dec or self.hidden_channels

    @property
    def decoder(self) -> DecoderHyper:
        return DecoderHyper(
            in_channels=self.out_channels,
            hidden_channels=self.h_dec,
            kernel_size=self.kernel_size_dec,
            dilation_rate=self.dilation_rate,
            n_blocks=self.n_blocks_dec,
            n_layers=self.n_block_layers,
            p_dropout=self.p_dropout_dec,
            n_split=self.n_split,
            n_sqz=self.n_sqz,
            sigmoid_scale=self.sigmoid_scale,
            gin_channels=self.gin_channels,
            unroll=self.unroll,
            remat=self.remat,
            wn_impl=self.wn_impl,
            wn_residuals=self.wn_residuals,
            block_fuse=self.block_fuse,
            block_fuse_reverse=self.block_fuse_reverse,
        )


def hyper_from_config(config: TrainingConfig) -> GlowTTSHyper:
    """Config → hyper mapping, mirroring setup_model (models.py:417-455)."""
    m = config.model
    wn_impl = _resolve_wn_impl(getattr(config, "wn_impl", "auto"))
    remat = _resolve_remat(config.remat_blocks, wn_impl)
    unroll = _resolve_unroll(getattr(config, "unroll_blocks", "auto"), wn_impl)
    wn_residuals = _resolve_wn_residuals(
        getattr(config, "wn_residuals", "auto"), wn_impl, unroll
    )
    block_fuse = _resolve_block_fuse(
        getattr(config, "flow_block_fuse", "auto"), wn_impl, wn_residuals
    )
    return GlowTTSHyper(
        n_vocab=m.num_symbols,
        hidden_channels=m.hidden_channels,
        filter_channels=m.filter_channels,
        filter_channels_dp=m.filter_channels_dp,
        out_channels=config.audio.mel_channels,
        kernel_size=m.kernel_size,
        n_heads=m.n_heads,
        n_layers_enc=m.n_layers_enc,
        p_dropout=m.p_dropout,
        n_blocks_dec=m.n_blocks_dec,
        kernel_size_dec=m.kernel_size_dec,
        dilation_rate=m.dilation_rate,
        n_block_layers=m.n_block_layers,
        p_dropout_dec=m.p_dropout_dec,
        n_speakers=m.n_speakers,
        gin_channels=m.gin_channels,
        n_split=m.n_split,
        n_sqz=m.n_sqz,
        sigmoid_scale=m.sigmoid_scale,
        window_size=m.window_size,
        block_length=m.block_length,
        mean_only=m.mean_only,
        hidden_channels_enc=m.hidden_channels_enc,
        hidden_channels_dec=m.hidden_channels_dec,
        prenet=m.prenet,
        unroll=unroll,
        remat=remat,
        remat_encoder=config.remat_encoder,
        wn_impl=wn_impl,
        wn_residuals=wn_residuals,
        block_fuse=block_fuse,
        block_fuse_reverse=_resolve_block_fuse_reverse(
            getattr(config, "flow_block_fuse_reverse", "auto"), wn_impl
        ),
        encoder_fuse=_resolve_encoder_fuse(
            getattr(config, "encoder_fuse", "auto"), wn_impl, m
        ),
    )


def _resolve_wn_impl(value: str) -> str:
    """"auto" -> the fused Pallas kernel on TPU backends, XLA elsewhere
    (interpret-mode Pallas jits to the same ops; no reason to default in)."""
    if value != "auto":
        return value
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _resolve_remat(value, wn_impl: str):
    """"auto" -> the measured winner per WN impl (config.py remat_blocks):
    the fused kernel's custom VJP already keeps residuals minimal, so block
    recompute on top of it is pure waste; the XLA stack wants full remat."""
    if value != "auto":
        return value
    return "none" if wn_impl == "pallas" else True


def _resolve_unroll(value, wn_impl: str) -> bool:
    """"auto" -> unroll the flow blocks (statically-indexed Python loop)
    wherever the fused Pallas WN kernel is the resolved impl on a real TPU
    backend; lax.scan elsewhere.  Unrolling is what makes residual-store
    backward win (see _resolve_wn_residuals): each block kernel's
    custom-VJP residuals become independent live values instead of scan
    outputs that XLA stacks with dynamic_update_slice.  Off-TPU the scan
    keeps compiles fast (interpret-mode kernels gain nothing from
    unrolling).  Explicit True/False wins."""
    if value != "auto":
        return bool(value)
    import jax

    return wn_impl == "pallas" and jax.default_backend() == "tpu"


def _resolve_wn_residuals(value: str, wn_impl: str, unroll: bool) -> str:
    """"auto" -> "store" when the fused WN kernel runs with unrolled
    blocks — the round-4 measured winner (v5e base config, interleaved
    A/B: 59.0 ms vs the round-3 default's 70.3 ms at b=128, 88.7 vs
    105.6 ms at b=192; MFU 0.57 -> 0.68).  Forward saves per-layer inputs
    + gate activations to HBM, and backward drops its in-kernel recompute
    pass to the 4 essential matmuls per layer.  Under lax.scan the same
    mode LOSES (81.7 ms at b=128): every per-block residual becomes a
    scan output that XLA stacks with dynamic_update_slice, and those
    copies cost more than the recompute they replace (the round-3c
    finding) — so scan resolves to "recompute"."""
    if value != "auto":
        return value
    return "store" if (wn_impl == "pallas" and unroll) else "recompute"


def _resolve_block_fuse(value, wn_impl: str, wn_residuals: str) -> bool:
    """"auto" -> fuse the whole training-forward flow block into one Pallas
    kernel wherever the fused WN kernel is the resolved impl.  The block
    kernel supports both backward strategies (ops/block_pallas.py:
    in-kernel recompute, or the round-4 residual-store backward that pairs
    with unrolled blocks).  Explicit True/False wins."""
    if value != "auto":
        return bool(value)
    return wn_impl == "pallas"


def _resolve_block_fuse_reverse(value, wn_impl: str) -> bool:
    """"auto" -> fuse the INVERSE (inference) block wherever the Pallas
    kernels are the resolved impl.  Independent of the training-forward
    block fuse: the inverse kernel (invconv⁻¹∘actnorm⁻¹ folded to one
    [c, c] affine + WN + coupling⁻¹) is the serving-latency winner
    regardless of the training backward strategy.  Explicit True/False
    pins just the reverse direction."""
    if value != "auto":
        return bool(value)
    return wn_impl == "pallas"


def _resolve_encoder_fuse(value, wn_impl: str, m) -> bool:
    """"auto" -> fuse each encoder layer into one Pallas kernel
    (ops/encoder_pallas.py) on TPU backends, for the configurations the
    kernel supports: rel-pos window set, no block_length (the reference
    encoder's only shipped configuration — attentions.py:178-188).
    Explicit True/False wins (encoder_apply still falls back op-by-op for
    unsupported configs)."""
    if value != "auto":
        return bool(value)
    return (
        wn_impl == "pallas"
        and m.window_size is not None
        and m.block_length is None
    )


# ---------------------------------------------------------------------------
# Duration predictor (models.py:21-51)
# ---------------------------------------------------------------------------


def duration_predictor_init(
    rng: jax.Array, in_channels: int, filter_channels: int, kernel_size: int
) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "conv_1": torch_conv_init(k1, kernel_size, in_channels, filter_channels),
        "norm_1": layer_norm_init(filter_channels),
        "conv_2": torch_conv_init(k2, kernel_size, filter_channels, filter_channels),
        "norm_2": layer_norm_init(filter_channels),
        "proj": torch_conv_init(k3, 1, filter_channels, 1),
    }


def duration_predictor_apply(
    params: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    p_dropout: float,
    rng: typing.Optional[jax.Array] = None,
    deterministic: bool = True,
    fused: bool = False,
) -> jnp.ndarray:
    """x: [b, t, c] -> log-durations [b, t, 1].  Order per models.py:41-51:
    conv → relu → norm → dropout (note: norm *after* relu here, unlike the
    prenet).  ``fused``: the conv stack as one Pallas kernel
    (ops/text_pallas.py), dropout-active off-TPU falls back op-by-op."""
    if fused and (
        deterministic
        or p_dropout == 0.0
        or rng is None
        or jax.default_backend() == "tpu"
    ):
        from ..ops.text_pallas import duration_predictor_fused

        return duration_predictor_fused(
            params, x, x_mask, p_dropout=p_dropout, rng=rng,
            deterministic=deterministic,
        )
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    x = conv1d(x * x_mask, params["conv_1"])
    x = jax.nn.relu(x)
    x = layer_norm(x, params["norm_1"])
    x = dropout(r1, x, p_dropout, deterministic)
    x = conv1d(x * x_mask, params["conv_2"])
    x = jax.nn.relu(x)
    x = layer_norm(x, params["norm_2"])
    x = dropout(r2, x, p_dropout, deterministic)
    x = conv1d(x * x_mask, params["proj"])
    return x * x_mask


# ---------------------------------------------------------------------------
# Model init (FlowGenerator.__init__ / TextEncoder.__init__)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(1,))
def init_model(rng: jax.Array, hp: GlowTTSHyper) -> Params:
    """Initialize all model params.  jit'd into ONE device program — eager
    init would dispatch hundreds of tiny RNG ops (pathological over a
    remote-device tunnel)."""
    keys = jax.random.split(rng, 8)
    h = hp.h_enc

    params: Params = {
        # scaled embedding, init N(0, h^-0.5) (models.py:90-91)
        "emb": jax.random.normal(keys[0], (hp.n_vocab, h)) * (h ** -0.5),
        "encoder": encoder_init(
            keys[1],
            h,
            hp.filter_channels,
            hp.n_heads,
            hp.n_layers_enc,
            hp.kernel_size,
            hp.window_size,
        ),
        "proj_m": torch_conv_init(keys[2], 1, h, hp.out_channels),
        "proj_w": duration_predictor_init(
            keys[3], h + hp.gin_channels, hp.filter_channels_dp, hp.kernel_size
        ),
        "decoder": decoder_init(keys[4], hp.decoder),
    }
    if hp.prenet:
        params["prenet"] = prenet_init(keys[5], h, h, h, kernel_size=5, n_layers=3)
    if not hp.mean_only:
        params["proj_s"] = torch_conv_init(keys[6], 1, h, hp.out_channels)
    if hp.n_speakers > 1:
        # uniform(-0.1, 0.1) speaker embedding (models.py:306-308)
        params["emb_g"] = jax.random.uniform(
            keys[7], (hp.n_speakers, hp.gin_channels), minval=-0.1, maxval=0.1
        )
    return params


# ---------------------------------------------------------------------------
# Text encoder forward (models.py:120-142)
# ---------------------------------------------------------------------------


def encoder_forward(
    params: Params,
    hp: GlowTTSHyper,
    x: jnp.ndarray,
    x_lengths: jnp.ndarray,
    g: typing.Optional[jnp.ndarray] = None,
    rng: typing.Optional[jax.Array] = None,
    deterministic: bool = True,
    compute_dtype=jnp.float32,
):
    """x: [b, t_x] int phoneme ids.  g: optional [b, 1, gin] speaker cond.

    Returns (x_m, x_logs, logw, x_mask) in channels-last layout."""
    t_x = x.shape[1]
    h = hp.h_enc
    r_pre = r_enc = r_dp = None
    if rng is not None:
        r_pre, r_enc, r_dp = jax.random.split(rng, 3)

    # jnp.asarray: params may arrive as host numpy (checkpoint load/export)
    emb = jnp.asarray(params["emb"]).astype(compute_dtype)
    xh = emb[x] * math.sqrt(h)  # [b, t, h]
    x_mask = time_mask(x_lengths, t_x, compute_dtype)

    if hp.prenet:
        xh = prenet_apply(
            params["prenet"], xh, x_mask, p_dropout=0.5, rng=r_pre,
            deterministic=deterministic, fused=hp.encoder_fuse,
        )
    xh = encoder_apply(
        params["encoder"],
        xh,
        x_mask,
        n_heads=hp.n_heads,
        window_size=hp.window_size,
        block_length=hp.block_length,
        p_dropout=hp.p_dropout,
        rng=r_enc,
        deterministic=deterministic,
        unroll=hp.unroll,
        # encoder remat: -2% at b=32 (the encoder stores little), +0.8% at
        # b=128 under memory pressure — off by default (config.remat_encoder)
        remat=hp.remat_encoder,
        fused=hp.encoder_fuse,
    )

    # duration predictor sees detached encoder output (+ non-detached speaker
    # vector, models.py:129-133)
    x_dp = jax.lax.stop_gradient(xh)
    if g is not None:
        g_exp = jnp.broadcast_to(g.astype(compute_dtype), (xh.shape[0], t_x, g.shape[-1]))
        x_dp = jnp.concatenate([x_dp, g_exp], axis=-1)

    x_m = conv1d(xh, params["proj_m"]) * x_mask
    if not hp.mean_only:
        x_logs = conv1d(xh, params["proj_s"]) * x_mask
    else:
        x_logs = jnp.zeros_like(x_m)

    logw = duration_predictor_apply(
        params["proj_w"], x_dp, x_mask, hp.p_dropout, rng=r_dp,
        deterministic=deterministic, fused=hp.encoder_fuse,
    )
    return x_m, x_logs, logw, x_mask


def _speaker_vector(
    params: Params, g_ids: typing.Optional[jnp.ndarray]
) -> typing.Optional[jnp.ndarray]:
    """L2-normalized speaker embedding lookup [b] -> [b, 1, gin]
    (models.py:321-322)."""
    if g_ids is None:
        return None
    g = jnp.asarray(params["emb_g"])[g_ids]  # [b, gin]
    norm = jnp.sqrt(jnp.sum(jnp.square(g), axis=-1, keepdims=True))
    g = g / jnp.maximum(norm, 1e-12)
    return g[:, None, :]


# ---------------------------------------------------------------------------
# Training forward (models.py:310-399, gen=False branch)
# ---------------------------------------------------------------------------


def forward_train(
    params: Params,
    hp: GlowTTSHyper,
    x: jnp.ndarray,
    x_lengths: jnp.ndarray,
    y: jnp.ndarray,
    y_lengths: jnp.ndarray,
    g_ids: typing.Optional[jnp.ndarray] = None,
    rng: typing.Optional[jax.Array] = None,
    deterministic: bool = True,
    compute_dtype=jnp.float32,
    mas_impl: str = "scan",
):
    """Training graph: encoder → flow-forward → pairwise logp → MAS → expand.

    x: [b, t_x] ids; y: [b, t_y, n_mel] mels (channels-last).
    Returns the reference's output triple (models.py:395-399).
    """
    r_enc = r_dec = None
    if rng is not None:
        r_enc, r_dec = jax.random.split(rng)

    g = _speaker_vector(params, g_ids)
    x_m, x_logs, logw, x_mask = encoder_forward(
        params, hp, x, x_lengths, g=g, rng=r_enc, deterministic=deterministic,
        compute_dtype=compute_dtype,
    )

    # preprocess (models.py:401-406): truncate mel frames to a multiple of n_sqz
    t_y = (y.shape[1] // hp.n_sqz) * hp.n_sqz
    y = y[:, :t_y].astype(compute_dtype)
    y_lengths = (y_lengths // hp.n_sqz) * hp.n_sqz
    z_mask = time_mask(y_lengths, t_y, compute_dtype)
    attn_mask = x_mask[:, :, 0][:, :, None] * z_mask[:, :, 0][:, None, :]  # [b,tx,ty]

    z, logdet = decoder_fwd(
        params["decoder"], y, z_mask, hp.decoder, g=g, rng=r_dec,
        deterministic=deterministic,
    )

    # pairwise gaussian log-likelihood, 4-term matmul decomposition
    # (models.py:362-376); fp32, no gradient flows through it (the path is
    # stop_gradient'ed below, matching the reference's no_grad + detach)
    x_m32 = x_m.astype(jnp.float32)
    x_logs32 = x_logs.astype(jnp.float32)
    z32 = z.astype(jnp.float32)
    x_s_sq_r = jnp.exp(-2.0 * x_logs32)  # [b, tx, d]
    logp1 = jnp.sum(-0.5 * math.log(2 * math.pi) - x_logs32, axis=-1)[:, :, None]
    logp2 = jnp.einsum(
        "bxd,byd->bxy", x_s_sq_r, -0.5 * jnp.square(z32),
        preferred_element_type=jnp.float32,
    )
    logp3 = jnp.einsum(
        "bxd,byd->bxy", x_m32 * x_s_sq_r, z32, preferred_element_type=jnp.float32
    )
    logp4 = jnp.sum(-0.5 * jnp.square(x_m32) * x_s_sq_r, axis=-1)[:, :, None]
    logp = logp1 + logp2 + logp3 + logp4  # [b, tx, ty]

    attn = jax.lax.stop_gradient(
        mas.maximum_path(logp, attn_mask.astype(jnp.float32), impl=mas_impl)
    ).astype(compute_dtype)

    # expand text stats to frames (models.py:383-392)
    z_m = jnp.einsum("bxy,bxd->byd", attn, x_m, preferred_element_type=jnp.float32)
    z_logs = jnp.einsum("bxy,bxd->byd", attn, x_logs, preferred_element_type=jnp.float32)
    z_m = z_m.astype(compute_dtype)
    z_logs = z_logs.astype(compute_dtype)
    # MAS durations as the duration-predictor target (models.py:393)
    logw_ = jnp.log(1e-8 + jnp.sum(attn, axis=2))[:, :, None] * x_mask

    return (
        (z, z_m, z_logs, logdet, z_mask),
        (x_m, x_logs, x_mask),
        (attn, logw, logw_),
    )


# ---------------------------------------------------------------------------
# Generation forward (models.py:326-359, gen=True branch)
# ---------------------------------------------------------------------------


def forward_gen(
    params: Params,
    hp: GlowTTSHyper,
    x: jnp.ndarray,
    x_lengths: jnp.ndarray,
    y_max_length: int,
    noise_rng: jax.Array,
    noise_scale: float = 1.0,
    length_scale: float = 1.0,
    g_ids: typing.Optional[jnp.ndarray] = None,
    compute_dtype=jnp.float32,
    encoder_out: typing.Optional[tuple] = None,
):
    """Generation graph with a static padded frame budget.

    The reference derives a dynamic output length from predicted durations
    (models.py:327-329); XLA requires static shapes, so frames are generated
    into a ``y_max_length`` buffer and the true lengths are returned.  If the
    predicted length exceeds the budget, durations are used as-is and the
    output is truncated by the mask (callers should bucket y_max_length, see
    infer CLI).

    ``encoder_out``: optional precomputed ``(x_m, x_logs, logw, x_mask)``
    from :func:`encoder_forward` — callers that already ran the encoder to
    size the frame budget (the infer CLI's pre-pass) pass it here so the
    encoder does not run twice per synthesis.

    Returns ((y, z_m, z_logs, z_mask), (x_m, x_logs, x_mask),
             (attn, logw, logw_), y_lengths).
    """
    g = _speaker_vector(params, g_ids)
    if encoder_out is None:
        x_m, x_logs, logw, x_mask = encoder_forward(
            params, hp, x, x_lengths, g=g, deterministic=True,
            compute_dtype=compute_dtype,
        )
    else:
        x_m, x_logs, logw, x_mask = encoder_out

    w = jnp.exp(logw.astype(jnp.float32)) * x_mask * length_scale
    w_ceil = jnp.ceil(w)  # [b, tx, 1]
    y_lengths = jnp.clip(
        jnp.sum(w_ceil, axis=(1, 2)), min=1.0
    ).astype(jnp.int32)
    y_lengths = jnp.minimum(y_lengths, y_max_length)
    # preprocess (models.py:405): floor lengths to a multiple of n_sqz
    t_y = (y_max_length // hp.n_sqz) * hp.n_sqz
    y_lengths = (y_lengths // hp.n_sqz) * hp.n_sqz

    z_mask = time_mask(y_lengths, t_y, compute_dtype)
    attn_mask = x_mask[:, :, 0][:, :, None] * z_mask[:, :, 0][:, None, :]
    attn = generate_path(w_ceil[:, :, 0], attn_mask)  # [b, tx, ty]

    z_m = jnp.einsum("bxy,bxd->byd", attn.astype(compute_dtype), x_m,
                     preferred_element_type=jnp.float32).astype(compute_dtype)
    z_logs = jnp.einsum("bxy,bxd->byd", attn.astype(compute_dtype), x_logs,
                        preferred_element_type=jnp.float32).astype(compute_dtype)
    logw_ = jnp.log(1e-8 + jnp.sum(attn, axis=2))[:, :, None] * x_mask

    eps = jax.random.normal(noise_rng, z_m.shape, dtype=jnp.float32).astype(
        compute_dtype
    )
    z = (z_m + jnp.exp(z_logs) * eps * noise_scale) * z_mask
    y, _ = decoder_inv(params["decoder"], z, z_mask, hp.decoder, g=g)

    return (
        (y, z_m, z_logs, z_mask),
        (x_m, x_logs, x_mask),
        (attn, logw, logw_),
        y_lengths,
    )


# ---------------------------------------------------------------------------
# DDI + inference prep
# ---------------------------------------------------------------------------


def ddi_init(
    params: Params,
    hp: GlowTTSHyper,
    x: jnp.ndarray,
    x_lengths: jnp.ndarray,
    y: jnp.ndarray,
    y_lengths: jnp.ndarray,
    g_ids: typing.Optional[jnp.ndarray] = None,
) -> Params:
    """Data-dependent ActNorm init from one training batch (ddi.py:20-39).

    Returns params with the decoder's ActNorm bias/logs replaced by batch
    statistics.  jit-able; under a mesh the statistics are computed over the
    global batch automatically (XLA inserts the cross-device reductions),
    which is *more* correct than the reference's per-replica init.
    """
    g = _speaker_vector(params, g_ids)
    t_y = (y.shape[1] // hp.n_sqz) * hp.n_sqz
    y = y[:, :t_y]
    y_lengths = (y_lengths // hp.n_sqz) * hp.n_sqz
    z_mask = time_mask(y_lengths, t_y, y.dtype)
    new_decoder = decoder_ddi(params["decoder"], y, z_mask, hp.decoder, g=g)
    out = dict(params)
    out["decoder"] = new_decoder
    return out


def store_inverse(params: Params) -> Params:
    """Precompute decoder inverses for fast generation (models.py:408-409)."""
    out = dict(params)
    out["decoder"] = decoder_store_inverse(params["decoder"])
    return out


def setup_model(
    config: TrainingConfig,
    params: typing.Optional[Params] = None,
    create_optimizer: bool = True,
    rng: typing.Optional[jax.Array] = None,
):
    """Convenience factory mirroring the reference's setup_model
    (models.py:417-470): returns (hyper, params, optimizer-or-None).

    Unlike the reference there is no device placement step — arrays live
    wherever jit places them."""
    from ..optimize import make_optimizer

    hp = hyper_from_config(config)
    if params is None:
        if rng is None:
            rng = jax.random.PRNGKey(config.seed)
        params = init_model(rng, hp)
    optimizer = make_optimizer(config) if create_optimizer else None
    return hp, params, optimizer
