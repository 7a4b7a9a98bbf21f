"""Relative-position multi-head attention, conv-FFN, prenet, and the text
encoder stack.

Behavioral parity with reference `/root/reference/glow_tts_train/attentions.py`
(`MultiHeadAttention` :148-344, `FFN` :347-381, `Encoder` :12-74) and
`layers.py` (`ConvReluNorm` :31-80), re-designed for TPU:

* channels-last ``[b, t, c]`` activations
* the N identical encoder layers are parameter-stacked and iterated with
  ``jax.lax.scan`` (one compiled layer body instead of N unrolled copies)
* the rel→abs / abs→rel index-shift pad+reshape tricks map 1:1 onto jnp
* attention mask fill uses −1e4 (not −inf), matching attentions.py:240
"""

import math
import typing

import jax
import jax.numpy as jnp
import numpy as np

from .conv import conv1d, torch_conv_init, xavier_uniform_conv_init, zero_conv_init
from .norms import layer_norm, layer_norm_init

Params = typing.Dict[str, typing.Any]


def dropout(
    rng: typing.Optional[jax.Array], x: jnp.ndarray, rate: float, deterministic: bool
) -> jnp.ndarray:
    """Inverted dropout (torch semantics: scale by 1/(1-p) at train time).

    Keep decision is a raw uint32-bits threshold compare instead of
    bernoulli's bits->float-uniform conversion, and the 1/(1-p) rescale is
    a precomputed multiply: together ~1.5% of the train step on v5e (the
    masks regenerate in backward under remat, doubling their cost).
    Keep probability is exact to 2^-32."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    if rate >= 1.0:  # keep-nothing: uint32 threshold would wrap to 0
        return jnp.zeros_like(x)
    threshold = np.uint32(min(round(rate * 2**32), 2**32 - 1))
    keep = jax.random.bits(rng, x.shape, dtype=jnp.uint32) >= threshold
    scale = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# Relative position helpers (attentions.py:284-333)
# ---------------------------------------------------------------------------


def get_relative_embeddings(
    rel_emb: jnp.ndarray, length: int, window_size: int
) -> jnp.ndarray:
    """Slice/pad the ±window rel-pos embedding table to 2*length-1 positions.

    rel_emb: [heads_rel, 2*window+1, k_ch]; positions beyond the window share
    the edge embedding via zero-padding (attentions.py:284-300).
    """
    pad_length = max(length - (window_size + 1), 0)
    slice_start = max((window_size + 1) - length, 0)
    if pad_length > 0:
        rel_emb = jnp.pad(rel_emb, ((0, 0), (pad_length, pad_length), (0, 0)))
    return rel_emb[:, slice_start : slice_start + 2 * length - 1]


def relative_to_absolute(x: jnp.ndarray) -> jnp.ndarray:
    """[b, h, l, 2l-1] -> [b, h, l, l] (attentions.py:302-319)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, l * 2 * l)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, l - 1)))
    return x_flat.reshape(b, h, l + 1, 2 * l - 1)[:, :, :l, l - 1 :]


def absolute_to_relative(x: jnp.ndarray) -> jnp.ndarray:
    """[b, h, l, l] -> [b, h, l, 2l-1] (attentions.py:321-333)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x_flat = x.reshape(b, h, l * l + l * (l - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (l, 0)))
    return x_flat.reshape(b, h, l, 2 * l)[:, :, :, 1:]


def attention_bias_proximal(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """-log1p(|i-j|) proximity bias [1, 1, l, l] (attentions.py:335-344)."""
    r = jnp.arange(length, dtype=jnp.float32)
    diff = r[None, :] - r[:, None]
    return (-jnp.log1p(jnp.abs(diff)))[None, None].astype(dtype)


# ---------------------------------------------------------------------------
# Multi-head attention (attentions.py:148-264)
# ---------------------------------------------------------------------------


def mha_init(
    rng: jax.Array,
    channels: int,
    out_channels: int,
    n_heads: int,
    window_size: typing.Optional[int],
    heads_share: bool = True,
    proximal_init: bool = False,
) -> Params:
    k_ch = channels // n_heads
    keys = jax.random.split(rng, 6)
    params: Params = {
        "q": xavier_uniform_conv_init(keys[0], 1, channels, channels),
        "k": xavier_uniform_conv_init(keys[1], 1, channels, channels),
        "v": xavier_uniform_conv_init(keys[2], 1, channels, channels),
        "o": torch_conv_init(keys[3], 1, channels, out_channels),
    }
    if proximal_init:
        # k starts as a copy of q (attentions.py:194-201)
        params["k"] = {"w": params["q"]["w"], "b": params["q"]["b"]}
    if window_size is not None:
        n_heads_rel = 1 if heads_share else n_heads
        rel_stddev = k_ch ** -0.5
        params["emb_rel_k"] = (
            jax.random.normal(keys[4], (n_heads_rel, 2 * window_size + 1, k_ch))
            * rel_stddev
        )
        params["emb_rel_v"] = (
            jax.random.normal(keys[5], (n_heads_rel, 2 * window_size + 1, k_ch))
            * rel_stddev
        )
    return params


def mha_apply(
    params: Params,
    x: jnp.ndarray,
    c: jnp.ndarray,
    attn_mask: typing.Optional[jnp.ndarray],
    n_heads: int,
    window_size: typing.Optional[int] = None,
    block_length: typing.Optional[int] = None,
    proximal_bias: bool = False,
    p_dropout: float = 0.0,
    rng: typing.Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Self/cross attention. x (queries), c (keys/values): [b, t, ch].

    attn_mask: [b, t_t, t_s] (1 = attend).  Returns [b, t_t, out_ch].
    """
    b, t_t, ch = x.shape
    t_s = c.shape[1]
    k_ch = ch // n_heads

    q = conv1d(x, params["q"])
    k = conv1d(c, params["k"])
    v = conv1d(c, params["v"])

    # [b, t, ch] -> [b, h, t, k_ch]
    def split_heads(u, t):
        return u.reshape(b, t, n_heads, k_ch).transpose(0, 2, 1, 3)

    q = split_heads(q, t_t)
    k = split_heads(k, t_s)
    v = split_heads(v, t_s)

    scale = 1.0 / math.sqrt(k_ch)
    scores = (
        jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
        * scale
    )

    if window_size is not None:
        assert t_s == t_t, "Relative attention is only available for self-attention."
        rel_k = get_relative_embeddings(
            params["emb_rel_k"].astype(x.dtype), t_s, window_size
        )
        # rel_k: [1, m, d] (heads_share) or [h, m, d] (per-head); align the
        # head axis — reducing over it would sum all heads' embeddings
        if rel_k.shape[0] == 1:
            rel_logits = jnp.einsum(
                "bhld,md->bhlm", q, rel_k[0], preferred_element_type=jnp.float32
            )
        else:
            rel_logits = jnp.einsum(
                "bhld,hmd->bhlm", q, rel_k, preferred_element_type=jnp.float32
            )
        scores = scores + relative_to_absolute(rel_logits) * scale

    if proximal_bias:
        assert t_s == t_t, "Proximal bias is only available for self-attention."
        scores = scores + attention_bias_proximal(t_s, scores.dtype)

    if attn_mask is not None:
        mask4 = attn_mask[:, None, :, :]
        scores = jnp.where(mask4 == 0, jnp.asarray(-1e4, scores.dtype), scores)
        if block_length is not None:
            # banded mask: |i-j| <= block_length (attentions.py:241-249)
            rows = jax.lax.broadcasted_iota(jnp.int32, (t_t, t_s), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (t_t, t_s), 1)
            band = (jnp.abs(rows - cols) <= block_length)[None, None]
            scores = jnp.where(band, scores, jnp.asarray(-1e4, scores.dtype))

    p_attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    p_attn = dropout(rng, p_attn, p_dropout, deterministic)

    out = jnp.einsum("bhts,bhsd->bhtd", p_attn, v, preferred_element_type=jnp.float32)

    if window_size is not None:
        rel_weights = absolute_to_relative(p_attn)
        rel_v = get_relative_embeddings(
            params["emb_rel_v"].astype(x.dtype), t_s, window_size
        )
        if rel_v.shape[0] == 1:
            out = out + jnp.einsum(
                "bhlm,md->bhld", rel_weights, rel_v[0],
                preferred_element_type=jnp.float32,
            )
        else:
            out = out + jnp.einsum(
                "bhlm,hmd->bhld", rel_weights, rel_v,
                preferred_element_type=jnp.float32,
            )

    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, t_t, ch)
    return conv1d(out, params["o"])


# ---------------------------------------------------------------------------
# Conv FFN (attentions.py:347-381)
# ---------------------------------------------------------------------------


def ffn_init(
    rng: jax.Array,
    in_channels: int,
    out_channels: int,
    filter_channels: int,
    kernel_size: int,
) -> Params:
    k1, k2 = jax.random.split(rng)
    return {
        "conv_1": torch_conv_init(k1, kernel_size, in_channels, filter_channels),
        "conv_2": torch_conv_init(k2, kernel_size, filter_channels, out_channels),
    }


def ffn_apply(
    params: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    p_dropout: float = 0.0,
    activation: typing.Optional[str] = None,
    rng: typing.Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    x = conv1d(x * x_mask, params["conv_1"])
    if activation == "gelu":
        x = x * jax.nn.sigmoid(1.702 * x)
    else:
        x = jax.nn.relu(x)
    x = dropout(rng, x, p_dropout, deterministic)
    x = conv1d(x * x_mask, params["conv_2"])
    return x * x_mask


# ---------------------------------------------------------------------------
# Encoder stack (attentions.py:12-74) — scan over stacked layer params
# ---------------------------------------------------------------------------


def encoder_init(
    rng: jax.Array,
    hidden_channels: int,
    filter_channels: int,
    n_heads: int,
    n_layers: int,
    kernel_size: int,
    window_size: typing.Optional[int],
) -> Params:
    def one_layer(key):
        k_attn, k_ffn = jax.random.split(key)
        return {
            "attn": mha_init(
                k_attn, hidden_channels, hidden_channels, n_heads, window_size
            ),
            "norm_1": layer_norm_init(hidden_channels),
            "ffn": ffn_init(
                k_ffn, hidden_channels, hidden_channels, filter_channels, kernel_size
            ),
            "norm_2": layer_norm_init(hidden_channels),
        }

    layers = [one_layer(k) for k in jax.random.split(rng, n_layers)]
    # stack along a leading axis so lax.scan iterates the layers
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def encoder_apply(
    params: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    n_heads: int,
    window_size: typing.Optional[int] = None,
    block_length: typing.Optional[int] = None,
    p_dropout: float = 0.0,
    rng: typing.Optional[jax.Array] = None,
    deterministic: bool = True,
    unroll: bool = False,
    remat: typing.Union[bool, str] = False,
    fused: bool = False,
) -> jnp.ndarray:
    """x: [b, t, c]; x_mask: [b, t, 1].

    ``unroll``: python-loop the layers instead of lax.scan (~5% faster on
    v5e, 3.5x slower compile — see flows.DecoderHyper.unroll).
    ``remat``: recompute layer activations in backward instead of storing
    them (same HBM-traffic trade as the flow blocks, flows.decoder_fwd).
    True/"full" recomputes everything; "dots" keeps conv/matmul outputs
    and recomputes only the elementwise glue (softmax, layernorm, rel-pos
    reshapes) — cheaper recompute, smaller residual stack than none.
    ``fused``: run each whole layer as one Pallas VMEM kernel
    (ops/encoder_pallas.py) instead of ~30 XLA ops.  Only the reference
    encoder's configuration is fusable (self-attn, rel-pos window set,
    no block_length); anything else silently uses the op-by-op path, as
    does dropout off-TPU (in-kernel dropout needs the TPU hardware PRNG
    — same policy as flows.decoder_fwd's block_fuse)."""
    use_rng = rng if rng is not None else jax.random.PRNGKey(0)
    # validate remat up front — the fused path ignores it (the kernel's
    # custom VJP subsumes remat) but an invalid value must fail on every
    # backend, not only where fusing is off
    assert remat in (True, False, "full", "dots", "none"), remat

    # dropout gating: the op-by-op path substitutes PRNGKey(0) when rng is
    # None, so a dropout-active call must NOT silently fuse to the
    # no-dropout kernel — only a real TPU rng path fuses with dropout on
    fused = fused and (
        window_size is not None
        and block_length is None
        and (
            deterministic
            or p_dropout == 0.0
            or (rng is not None and jax.default_backend() == "tpu")
        )
    )
    if fused:
        from .encoder_pallas import (
            encoder_layer_fused_folded,
            fold_encoder_layers,
        )

        # batched fold for all layers outside the scan (reshapes/casts
        # only) — per-iteration folds would become stacked scan residuals
        folded_all = fold_encoder_layers(params, x.dtype)
        kernel_size = params["ffn"]["conv_1"]["w"].shape[1]

        def fused_layer(carry, weights):
            x, i = carry
            x = encoder_layer_fused_folded(
                weights,
                x,
                x_mask,
                n_heads=n_heads,
                window_size=window_size,
                kernel_size=kernel_size,
                p_dropout=p_dropout,
                rng=jax.random.fold_in(use_rng, i),
                deterministic=deterministic,
            )
            return (x, i + 1), None

        # no jax.checkpoint here: the kernel's custom VJP already stores
        # only (x, weights) and recomputes in-kernel — remat on top would
        # just re-run the forward kernel once more for nothing
        carry = (x, jnp.int32(0))
        if unroll:
            n_layers = folded_all[0].shape[0]
            for i in range(n_layers):
                w_i = jax.tree_util.tree_map(lambda a, i=i: a[i], folded_all)
                carry, _ = fused_layer(carry, w_i)
            x = carry[0]
        else:
            (x, _), _ = jax.lax.scan(fused_layer, carry, folded_all)
        return x * x_mask

    attn_mask = (x_mask[:, :, 0][:, None, :] * x_mask[:, :, 0][:, :, None])

    def layer(carry, inp):
        x, i = carry
        layer_params = inp
        lrng = jax.random.fold_in(use_rng, i)
        r1, r2, r3, r4 = jax.random.split(lrng, 4)
        x = x * x_mask
        y = mha_apply(
            layer_params["attn"],
            x,
            x,
            attn_mask,
            n_heads=n_heads,
            window_size=window_size,
            block_length=block_length,
            p_dropout=p_dropout,
            rng=r1,
            deterministic=deterministic,
        )
        y = dropout(r2, y, p_dropout, deterministic)
        x = layer_norm(x + y, layer_params["norm_1"])

        y = ffn_apply(
            layer_params["ffn"],
            x,
            x_mask,
            p_dropout=p_dropout,
            rng=r3,
            deterministic=deterministic,
        )
        y = dropout(r4, y, p_dropout, deterministic)
        x = layer_norm(x + y, layer_params["norm_2"])
        return (x, i + 1), None

    if remat and remat != "none":
        policy = (
            jax.checkpoint_policies.dots_saveable if remat == "dots" else None
        )
        layer = jax.checkpoint(layer, policy=policy)

    carry = (x, jnp.int32(0))
    if unroll:
        n_layers = jax.tree_util.tree_leaves(params)[0].shape[0]
        for i in range(n_layers):
            lp = jax.tree_util.tree_map(lambda a: a[i], params)
            carry, _ = layer(carry, lp)
        x = carry[0]
    else:
        (x, _), _ = jax.lax.scan(layer, carry, params)
    return x * x_mask


# ---------------------------------------------------------------------------
# ConvReluNorm prenet (layers.py:31-80) — scan over stacked conv layers
# ---------------------------------------------------------------------------


def prenet_init(
    rng: jax.Array,
    in_channels: int,
    hidden_channels: int,
    out_channels: int,
    kernel_size: int = 5,
    n_layers: int = 3,
) -> Params:
    assert in_channels == hidden_channels, (
        "scan-stacked prenet requires in_channels == hidden_channels "
        "(true for the Glow-TTS config: 192 -> 192)"
    )
    keys = jax.random.split(rng, n_layers)
    layers = [
        {
            "conv": torch_conv_init(keys[i], kernel_size, hidden_channels, hidden_channels),
            "norm": layer_norm_init(hidden_channels),
        }
        for i in range(n_layers)
    ]
    return {
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "proj": zero_conv_init(1, hidden_channels, out_channels),
    }


def prenet_apply(
    params: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    p_dropout: float = 0.5,
    rng: typing.Optional[jax.Array] = None,
    deterministic: bool = True,
    fused: bool = False,
) -> jnp.ndarray:
    """``fused``: run the whole stack as one Pallas kernel
    (ops/text_pallas.py); in-kernel dropout needs the TPU hardware PRNG,
    so dropout-active off-TPU falls back op-by-op (same policy as
    encoder_apply)."""
    # (rng=None + dropout-active would drop with PRNGKey(0) op-by-op but
    # not in-kernel — don't fuse that signature; see encoder_apply)
    if fused and (
        deterministic
        or p_dropout == 0.0
        or (rng is not None and jax.default_backend() == "tpu")
    ):
        from .text_pallas import prenet_fused

        return prenet_fused(
            params, x, x_mask, p_dropout=p_dropout, rng=rng,
            deterministic=deterministic,
        )
    x_org = x
    use_rng = rng if rng is not None else jax.random.PRNGKey(0)

    def layer(carry, layer_params):
        x, i = carry
        lrng = jax.random.fold_in(use_rng, i)
        x = conv1d(x * x_mask, layer_params["conv"])
        x = layer_norm(x, layer_params["norm"])
        x = jax.nn.relu(x)
        x = dropout(lrng, x, p_dropout, deterministic)
        return (x, i + 1), None

    carry = (x, jnp.int32(0))
    n_layers = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]
    for i in range(n_layers):
        lp = jax.tree_util.tree_map(lambda a: a[i], params["layers"])
        carry, _ = layer(carry, lp)
    x = carry[0]
    x = x_org + conv1d(x, params["proj"])
    return x * x_mask
