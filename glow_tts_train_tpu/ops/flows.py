"""Normalizing-flow bijectors and the flow decoder stack.

Behavioral parity with the reference:
* ActNorm            — layers.py:173-221 (incl. data-dependent init stats)
* InvConvNear        — layers.py:224-275 (grouped invertible 1x1 conv, QR init)
* WN (WaveNet stack) — layers.py:83-170 (weight-normed dilated convs, gated
                       tanh·sigmoid, res/skip split, global conditioning)
* CouplingBlock      — attentions.py:77-145 (affine coupling)
* squeeze/unsqueeze  — utils.py:135-160 (time↔channel folding)
* FlowSpecDecoder    — models.py:145-215

TPU-first design: channels-last [b, t, c]; the n_blocks identical
[ActNorm → InvConvNear → Coupling] blocks are parameter-stacked and run under
``jax.lax.scan`` (forward, reverse, and DDI-init are all single compiled
block bodies).  logdet accumulates in fp32.  One intentional numerical
divergence: InvConvNear uses log|det| (slogdet) where torch.logdet would NaN
on a negative determinant; determinants start positive (QR init with sign
fix) so the two agree on the training trajectory.
"""

import typing

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from .conv import (
    conv1d,
    torch_conv_init,
    weight_norm_init,
    zero_conv_init,
)
from .attention import dropout
from .gated import gated_tanh_sigmoid

Params = typing.Dict[str, typing.Any]


# ---------------------------------------------------------------------------
# squeeze / unsqueeze (utils.py:135-160)
# ---------------------------------------------------------------------------


def squeeze(
    x: jnp.ndarray, x_mask: typing.Optional[jnp.ndarray], n_sqz: int = 2
) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold time into channels: [b, t, c] -> [b, t//n, c*n].

    Output channel j*c+ci holds input frame t'*n+j, channel ci — the same
    ordering as the reference's view/permute (utils.py:140-141).
    Mask is subsampled at stride n starting at n-1 (utils.py:144).
    """
    b, t, c = x.shape
    t_trunc = (t // n_sqz) * n_sqz
    x = x[:, :t_trunc]
    x_sqz = x.reshape(b, t_trunc // n_sqz, n_sqz * c)
    if x_mask is not None:
        x_mask = x_mask[:, n_sqz - 1 :: n_sqz]
    else:
        x_mask = jnp.ones((b, t_trunc // n_sqz, 1), x.dtype)
    return x_sqz * x_mask, x_mask


def unsqueeze(
    x: jnp.ndarray, x_mask: typing.Optional[jnp.ndarray], n_sqz: int = 2
) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of squeeze: [b, t, C] -> [b, t*n, C//n] (utils.py:150-160)."""
    b, t, c = x.shape
    x_unsqz = x.reshape(b, t * n_sqz, c // n_sqz)
    if x_mask is not None:
        x_mask = jnp.repeat(x_mask, n_sqz, axis=1)
    else:
        x_mask = jnp.ones((b, t * n_sqz, 1), x.dtype)
    return x_unsqz * x_mask, x_mask


# ---------------------------------------------------------------------------
# ActNorm (layers.py:173-221)
# ---------------------------------------------------------------------------


def actnorm_init(channels: int) -> Params:
    return {
        "logs": jnp.zeros((channels,), jnp.float32),
        "bias": jnp.zeros((channels,), jnp.float32),
    }


def actnorm_fwd(params: Params, x, x_mask):
    """z = (bias + exp(logs) * x) * mask; logdet = sum(logs) * n_frames."""
    logs = params["logs"].astype(x.dtype)
    bias = params["bias"].astype(x.dtype)
    z = (bias + jnp.exp(logs) * x) * x_mask
    x_len = jnp.sum(x_mask.astype(jnp.float32), axis=(1, 2))  # frames per sample
    logdet = jnp.sum(params["logs"].astype(jnp.float32)) * x_len
    return z, logdet


def actnorm_inv(params: Params, x, x_mask):
    logs = params["logs"].astype(x.dtype)
    bias = params["bias"].astype(x.dtype)
    return (x - bias) * jnp.exp(-logs) * x_mask


def actnorm_ddi_stats(x, x_mask) -> Params:
    """Data-dependent init: bias/logs from masked batch statistics so the
    output is ~N(0, 1) per channel (layers.py:207-221)."""
    xf = x.astype(jnp.float32)
    mf = x_mask.astype(jnp.float32)
    denom = jnp.sum(mf, axis=(0, 1))  # [1] broadcasting over channels
    m = jnp.sum(xf * mf, axis=(0, 1)) / denom
    m_sq = jnp.sum(xf * xf * mf, axis=(0, 1)) / denom
    v = m_sq - m ** 2
    logs = 0.5 * jnp.log(jnp.clip(v, min=1e-6))
    return {"bias": -m * jnp.exp(-logs), "logs": -logs}


# ---------------------------------------------------------------------------
# InvConvNear (layers.py:224-275)
# ---------------------------------------------------------------------------


def invconv_init(rng: jax.Array, n_split: int = 4) -> Params:
    w = jnp.linalg.qr(jax.random.normal(rng, (n_split, n_split)))[0]
    # det-sign fix (layers.py:234-235): flip first column if det < 0
    w = jnp.where(jnp.linalg.det(w) < 0, w.at[:, 0].multiply(-1.0), w)
    return {"weight": w}


def _invconv_selectors(c: int, n_split: int):
    """Static one-hot selectors for the reference's channel regrouping
    (layers.py:247-252): channels viewed as [2, c//s, s//2] (split in half,
    interleave), outer half-split + inner interleave folded into one group
    axis of size s.  Derived from the reshape strides so the mapping cannot
    drift from the view it replaces:
    a = ch // (c//2), q = (ch % (c//2)) // (s//2), r = ch % (s//2);
    group = a*(s//2) + r.

    Returns (S, QQT): S [c, s] one-hot group selector, QQT [c, c] 0/1 mask
    of same-within-group-position channel pairs."""
    s = n_split
    ch = np.arange(c)
    a = ch // (c // 2)  # outer half (reshape dim of size 2)
    q = (ch % (c // 2)) // (s // 2)  # within-group coordinate (size c//s)
    r = ch % (s // 2)  # inner interleave (reshape dim of size s//2)
    group = a * (s // 2) + r
    sel = np.zeros((c, s), np.float32)
    sel[ch, group] = 1.0
    qqt = (q[:, None] == q[None, :]).astype(np.float32)
    return sel, qqt


def _invconv_dense(weight: jnp.ndarray, c: int, n_split: int) -> jnp.ndarray:
    """Expand the s x s group-mixing matrix to the equivalent dense [c, c]
    channel map M = P^T (W (x) I_{c/s}) P = (S @ W @ S^T) * QQT.

    The reference applies W over a grouped view of the channels
    (layers.py:247-252: reshape -> transpose -> 1x1 conv -> undo).  Those
    per-block reshapes break the TPU's 128-lane tiling ([.., 2, c/s, s/2]
    puts 2-wide axes in the lanes) and showed up as ~10% of the train step
    in the profile.  One dense [c, c] matmul on the original layout is the
    same linear map, MXU-aligned, with zero data movement.  M is built from
    static one-hot selectors with two tiny matmuls — a [c, c] gather of W
    would be ~20% of the step (TPU gathers are scalar-unit work; measured)."""
    sel, qqt = _invconv_selectors(c, n_split)
    sel = jnp.asarray(sel, weight.dtype)
    m = sel @ weight @ sel.T
    return m * jnp.asarray(qqt, weight.dtype)


def invconv_apply(params: Params, x, x_mask, reverse: bool = False,
                  no_jacobian: bool = False):
    b, t, c = x.shape
    w = params["weight"]
    s = w.shape[0]
    x_len = jnp.sum(x_mask.astype(jnp.float32), axis=(1, 2))

    if reverse:
        if "weight_inv" in params:
            weight = params["weight_inv"]
        else:
            weight = jnp.linalg.inv(w.astype(jnp.float32))
        logdet = None
    else:
        weight = w
        if no_jacobian:  # layers.py:262-263
            logdet = jnp.zeros_like(x_len)
        else:
            sign, logabsdet = jnp.linalg.slogdet(w.astype(jnp.float32))
            logdet = logabsdet * (c / s) * x_len  # [b]

    # z_d = sum_c M[d, c] x_c, M the dense expansion of the s x s mix.
    # fp32 inputs (inference, parity) use precision=HIGHEST so the
    # forward/inverse pair stays exact; bf16 training compute uses the
    # single-pass MXU like every other matmul in the step (HIGHEST here
    # forces multi-pass fp32 and costs ~25% of the step, measured).
    m = _invconv_dense(weight.astype(jnp.float32), c, s).astype(x.dtype)
    precision = (
        jax.lax.Precision.HIGHEST
        if x.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    z = jnp.einsum("btc,dc->btd", x, m, precision=precision)
    z = z * x_mask
    return z, logdet


def invconv_store_inverse(params: Params) -> Params:
    out = dict(params)
    out["weight_inv"] = jnp.linalg.inv(params["weight"].astype(jnp.float32))
    return out


# ---------------------------------------------------------------------------
# WN — WaveNet-style gated conv stack (layers.py:83-170)
# ---------------------------------------------------------------------------


def wn_init(
    rng: jax.Array,
    hidden_channels: int,
    kernel_size: int,
    n_layers: int,
    gin_channels: int = 0,
) -> Params:
    h = hidden_channels
    keys = jax.random.split(rng, 2 * n_layers + 1)
    in_layers = [
        weight_norm_init(keys[i], kernel_size, h, 2 * h) for i in range(n_layers)
    ]
    res_skip = [
        weight_norm_init(keys[n_layers + i], 1, h, 2 * h) for i in range(n_layers - 1)
    ]
    params: Params = {
        "in_layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *in_layers),
        "res_skip_last": weight_norm_init(keys[2 * n_layers - 1], 1, h, h),
    }
    if n_layers > 1:
        params["res_skip"] = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *res_skip
        )
    if gin_channels != 0:
        params["cond"] = weight_norm_init(
            keys[2 * n_layers], 1, gin_channels, 2 * h * n_layers
        )
    return params


def wn_apply(
    params: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    g: typing.Optional[jnp.ndarray],
    hidden_channels: int,
    dilation_rate: int,
    n_layers: int,
    p_dropout: float = 0.0,
    rng: typing.Optional[jax.Array] = None,
    deterministic: bool = True,
    impl: str = "xla",
    residuals: str = "recompute",
) -> jnp.ndarray:
    """x: [b, t, h]; g: optional [b, 1, gin] global conditioning.

    ``impl="pallas"`` runs the whole gated stack as one fused VMEM kernel
    with a custom-VJP backward (ops/wn_pallas.py) — same math, ~4x less
    HBM traffic; its dropout uses the TPU hardware PRNG (different stream,
    same statistics).  ``residuals`` (pallas only) picks the backward
    strategy: "recompute" in-kernel vs "store" forward-saved (see
    wn_pallas.wn_stack_fused)."""
    if impl == "pallas":
        from .wn_pallas import wn_apply_pallas

        return wn_apply_pallas(
            params, x, x_mask, g, hidden_channels, dilation_rate, n_layers,
            p_dropout=p_dropout, rng=rng, deterministic=deterministic,
            residuals=residuals,
        )
    h = hidden_channels
    output = jnp.zeros_like(x)

    g_all = None
    if g is not None:
        # match the activation dtype: f32 conditioning would promote the
        # whole gated stack (and the flow scan carry) out of bf16
        g_all = conv1d(g, params["cond"]).astype(x.dtype)  # [b, 1, 2*h*n_l]

    for i in range(n_layers):
        dilation = dilation_rate ** i
        in_p = jax.tree_util.tree_map(lambda a: a[i], params["in_layers"])
        # named for the "xin" remat policy: the k-wide in_layer convs are
        # ~83% of the WN stack's conv FLOPs, so saving exactly these
        # outputs lets backward's block recompute do only 1x1 convs and
        # elementwise work (see DecoderHyper.remat)
        x_in = checkpoint_name(conv1d(x, in_p, dilation=dilation), "wn_xin")
        if rng is not None:
            x_in = dropout(jax.random.fold_in(rng, i), x_in, p_dropout, deterministic)
        if g_all is not None:
            g_l = g_all[..., i * 2 * h : (i + 1) * 2 * h]
        else:
            g_l = jnp.zeros_like(x_in)
        acts = gated_tanh_sigmoid(x_in, g_l, h)

        if i < n_layers - 1:
            rs_p = jax.tree_util.tree_map(lambda a: a[i], params["res_skip"])
            res_skip_acts = conv1d(acts, rs_p)
            x = (x + res_skip_acts[..., :h]) * x_mask
            output = output + res_skip_acts[..., h:]
        else:
            res_skip_acts = conv1d(acts, params["res_skip_last"])
            output = output + res_skip_acts
    return output * x_mask


# ---------------------------------------------------------------------------
# CouplingBlock (attentions.py:77-145)
# ---------------------------------------------------------------------------


def coupling_init(
    rng: jax.Array,
    in_channels: int,
    hidden_channels: int,
    kernel_size: int,
    n_layers: int,
    gin_channels: int = 0,
) -> Params:
    k_start, k_wn = jax.random.split(rng)
    return {
        "start": weight_norm_init(k_start, 1, in_channels // 2, hidden_channels),
        "end": zero_conv_init(1, hidden_channels, in_channels),
        "wn": wn_init(k_wn, hidden_channels, kernel_size, n_layers, gin_channels),
    }


def coupling_apply(
    params: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    g: typing.Optional[jnp.ndarray],
    hidden_channels: int,
    dilation_rate: int,
    n_layers: int,
    sigmoid_scale: bool = False,
    reverse: bool = False,
    p_dropout: float = 0.0,
    rng: typing.Optional[jax.Array] = None,
    deterministic: bool = True,
    wn_impl: str = "xla",
    wn_residuals: str = "recompute",
):
    """Affine coupling: identity on the first half, affine on the second."""
    c = x.shape[-1]
    x_0, x_1 = x[..., : c // 2], x[..., c // 2 :]

    hidden = conv1d(x_0, params["start"]) * x_mask
    hidden = wn_apply(
        params["wn"],
        hidden,
        x_mask,
        g,
        hidden_channels,
        dilation_rate,
        n_layers,
        p_dropout=p_dropout,
        rng=rng,
        deterministic=deterministic,
        impl=wn_impl,
        residuals=wn_residuals,
    )
    # named for the "wn" remat policy: save exactly the WN stack outputs;
    # backward then recomputes only the cheap non-WN matmuls (actnorm,
    # invconv, start/end 1x1) while the fused kernel's own VJP handles its
    # internals — see DecoderHyper.remat
    hidden = checkpoint_name(hidden, "wn_out")
    out = conv1d(hidden, params["end"])

    m = out[..., : c // 2]
    logs = out[..., c // 2 :]
    if sigmoid_scale:
        logs = jnp.log(1e-6 + jax.nn.sigmoid(logs + 2))

    if reverse:
        z_1 = (x_1 - m) * jnp.exp(-logs) * x_mask
        logdet = None
    else:
        z_1 = (m + jnp.exp(logs) * x_1) * x_mask
        logdet = jnp.sum(
            logs.astype(jnp.float32) * x_mask.astype(jnp.float32), axis=(1, 2)
        )

    z = jnp.concatenate([x_0, z_1], axis=-1)
    return z, logdet


# ---------------------------------------------------------------------------
# FlowSpecDecoder (models.py:145-215) — scan over stacked blocks
# ---------------------------------------------------------------------------


class DecoderHyper(typing.NamedTuple):
    """Static hyperparameters of the flow decoder.

    ``unroll``: iterate the blocks as a Python loop (statically indexed
    stacked params) instead of lax.scan.  Round-2 A/B on v5e (RPC-jitter-
    immune timing) measured unroll 10-15% slower per step at ~3.5x the
    compile time — scan is the default and the measured winner.

    ``remat``: activation rematerialization strategy for the backward pass.
    True/"full" recomputes each block (stores only block inputs — minimal
    HBM traffic); "dots" stores matmul/conv outputs and recomputes only
    elementwise ops (jax.checkpoint_policies.dots_saveable — fewer recompute
    FLOPs, more HBM); False/"none" stores everything.
    """

    in_channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_blocks: int
    n_layers: int
    p_dropout: float = 0.0
    n_split: int = 4
    n_sqz: int = 2
    sigmoid_scale: bool = False
    gin_channels: int = 0
    unroll: bool = False
    remat: typing.Union[bool, str] = True
    # WN stack implementation: "xla" (op-by-op, XLA-fused) or "pallas"
    # (one fused VMEM kernel + custom-VJP backward, ops/wn_pallas.py)
    wn_impl: str = "xla"
    # Pallas backward strategy: "recompute" (in-kernel forward recompute) or
    # "store" (forward saves layer inputs + gates to HBM; backward skips
    # the recompute pass) — see wn_pallas.wn_stack_fused
    wn_residuals: str = "recompute"
    # Fuse each ENTIRE block into one Pallas kernel (ops/block_pallas.py):
    # training forward (folded actnorm∘invconv matmul + start/end 1x1 + WN
    # stack + affine coupling + logdet, custom-VJP backward) AND inference
    # reverse (coupling⁻¹ + folded invconv⁻¹∘actnorm⁻¹).  DDI stays
    # op-by-op (runs once).
    block_fuse: bool = False
    # The reverse (inference) direction separately; config
    # flow_block_fuse_reverse "auto" resolves it to block_fuse.
    block_fuse_reverse: bool = False


def decoder_init(rng: jax.Array, hp: DecoderHyper) -> Params:
    c_sqz = hp.in_channels * hp.n_sqz

    def one_block(key):
        k_inv, k_coup = jax.random.split(key)
        return {
            "actnorm": actnorm_init(c_sqz),
            "invconv": invconv_init(k_inv, hp.n_split),
            "coupling": coupling_init(
                k_coup,
                c_sqz,
                hp.hidden_channels,
                hp.kernel_size,
                hp.n_layers,
                hp.gin_channels,
            ),
        }

    blocks = [one_block(k) for k in jax.random.split(rng, hp.n_blocks)]
    return {"blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)}


def decoder_fwd(
    params: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    hp: DecoderHyper,
    g: typing.Optional[jnp.ndarray] = None,
    rng: typing.Optional[jax.Array] = None,
    deterministic: bool = True,
):
    """Forward (mel -> z) with logdet accumulation.  x: [b, t, c]."""
    if hp.n_sqz > 1:
        x, x_mask = squeeze(x, x_mask, hp.n_sqz)
    use_rng = rng if rng is not None else jax.random.PRNGKey(0)

    # block_fuse needs the TPU PRNG for in-kernel dropout; off-TPU with
    # dropout active, fall back to the op-by-op body (same policy as
    # wn_apply_pallas).  rng=None + dropout-active also falls back: the
    # op-by-op body substitutes PRNGKey(0) and drops, which the fused body
    # would too (it folds use_rng per block) — but interpret mode cannot
    # lower the TPU PRNG, so that signature must not fuse off-TPU.
    fused = hp.block_fuse and (
        deterministic
        or hp.p_dropout == 0.0
        or jax.default_backend() == "tpu"
    )
    if fused:
        from .block_pallas import flow_block_fused_folded, fold_blocks_stacked

        c = x.shape[-1]
        x_len = jnp.sum(x_mask.astype(jnp.float32), axis=(1, 2))  # [b]
        # batched weight fold for all blocks at once, outside the scan —
        # folding per iteration makes the folded weights scan residuals
        # (~5 ms/step of dynamic_update_slice stacking at b=192)
        folded_all, logs_sum_all, logabsdet_all, g_all_blocks = (
            fold_blocks_stacked(
                params["blocks"], hp.n_layers, hp.n_split, x.dtype, g,
                hp.hidden_channels,
            )
        )

    def _fused_body(carry, xs):
        folded, logs_sum, logabsdet, g_blk = xs
        x, logdet_tot, i = carry
        brng = jax.random.fold_in(use_rng, i)
        # actnorm/invconv logdets depend only on weights and x_len — they
        # stay outside the kernel (actnorm_fwd / invconv_apply semantics,
        # layers.py:197 and :265)
        ld1 = logs_sum * x_len
        ld2 = logabsdet * (c / hp.n_split) * x_len
        x, ld3 = flow_block_fused_folded(
            folded,
            g_blk,
            x,
            x_mask,
            kernel_size=hp.kernel_size,
            dilation_rate=hp.dilation_rate,
            n_layers=hp.n_layers,
            sigmoid_scale=hp.sigmoid_scale,
            p_dropout=hp.p_dropout,
            rng=brng,
            deterministic=deterministic,
            residuals=hp.wn_residuals,
        )
        return (x, logdet_tot + ld1 + ld2 + ld3, i + 1), None

    def _block_body(carry, block_params):
        x, logdet_tot, i = carry
        brng = jax.random.fold_in(use_rng, i)
        x, ld1 = actnorm_fwd(block_params["actnorm"], x, x_mask)
        x, ld2 = invconv_apply(block_params["invconv"], x, x_mask, reverse=False)
        x, ld3 = coupling_apply(
            block_params["coupling"],
            x,
            x_mask,
            g,
            hp.hidden_channels,
            hp.dilation_rate,
            hp.n_layers,
            sigmoid_scale=hp.sigmoid_scale,
            wn_impl=hp.wn_impl,
            wn_residuals=hp.wn_residuals,
            reverse=False,
            p_dropout=hp.p_dropout,
            rng=brng,
            deterministic=deterministic,
        )
        return (x, logdet_tot + ld1 + ld2 + ld3, i + 1), None

    assert hp.remat in (True, False, "full", "dots", "xin", "wn", "none"), (
        f"remat_blocks must be true/false/'full'/'dots'/'xin'/'wn'/'none', "
        f"got {hp.remat!r}"
    )
    body = _fused_body if fused else _block_body
    if hp.remat and hp.remat != "none":
        # recompute block activations (incl. dropout masks — the rng replay
        # reproduces them) in backward instead of storing 12 blocks'
        # residuals: ~9% faster step on v5e, HBM-traffic bound.  "dots"
        # keeps conv/matmul outputs and recomputes only elementwise ops.
        # "xin" keeps ONLY the k-wide in_layer conv outputs (the expensive
        # 83% of WN conv FLOPs) so the backward recompute is 1x1 convs +
        # elementwise — a middle point between "full" (recompute all) and
        # "dots" (store all matmul outputs).
        # "wn" saves ONLY the WN stack outputs: backward recomputes the
        # cheap non-WN matmuls (actnorm/invconv/start/end) instead of
        # storing every block intermediate ("none") or recomputing the
        # whole WN stack ("full") — the sweet spot when the stack is the
        # fused kernel, whose custom VJP regenerates its own internals.
        policy = None
        if hp.remat == "dots":
            policy = jax.checkpoint_policies.dots_saveable
        elif hp.remat == "xin":
            policy = jax.checkpoint_policies.save_only_these_names("wn_xin")
        elif hp.remat == "wn":
            policy = jax.checkpoint_policies.save_only_these_names("wn_out")
        body = jax.checkpoint(body, policy=policy)

    b = x.shape[0]
    carry = (x, jnp.zeros((b,), jnp.float32), jnp.int32(0))
    xs = (
        (folded_all, logs_sum_all, logabsdet_all, g_all_blocks)
        if fused
        else params["blocks"]
    )
    if hp.unroll:
        for i in range(hp.n_blocks):
            xi = jax.tree_util.tree_map(lambda a, i=i: a[i], xs)
            carry, _ = body(carry, xi)
        x, logdet_tot, _ = carry
    else:
        (x, logdet_tot, _), _ = jax.lax.scan(body, carry, xs)
    if hp.n_sqz > 1:
        x, x_mask = unsqueeze(x, x_mask, hp.n_sqz)
    return x, logdet_tot


def decoder_inv(
    params: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    hp: DecoderHyper,
    g: typing.Optional[jnp.ndarray] = None,
):
    """Inverse (z -> mel): blocks in reverse order, each bijector inverted.

    With ``hp.block_fuse`` each inverse block runs as ONE Pallas kernel
    (ops/block_pallas.py::_block_inv_kernel) — at serving batch sizes the
    op-by-op inverse is dispatch-bound (12 blocks x ~8 ops on [b~1, t, c]
    tensors), so fusing the whole block is the latency lever.  Inference is
    deterministic (no dropout), so no PRNG gating is needed."""
    if hp.n_sqz > 1:
        x, x_mask = squeeze(x, x_mask, hp.n_sqz)

    if hp.block_fuse_reverse:
        from .block_pallas import (
            flow_block_inv_fused_folded,
            fold_blocks_stacked_inverse,
        )

        folded_all, g_all_blocks = fold_blocks_stacked_inverse(
            params["blocks"], hp.n_layers, hp.n_split, x.dtype, g,
            hp.hidden_channels,
        )

        def fused_block(x, xs):
            folded, g_blk = xs
            x = flow_block_inv_fused_folded(
                folded, g_blk, x, x_mask,
                kernel_size=hp.kernel_size,
                dilation_rate=hp.dilation_rate,
                n_layers=hp.n_layers,
                sigmoid_scale=hp.sigmoid_scale,
            )
            return x, None

        xs = (folded_all, g_all_blocks)
        if hp.unroll:
            for i in reversed(range(hp.n_blocks)):
                xi = jax.tree_util.tree_map(lambda a, i=i: a[i], xs)
                x, _ = fused_block(x, xi)
        else:
            rev = jax.tree_util.tree_map(lambda a: a[::-1], xs)
            x, _ = jax.lax.scan(fused_block, x, rev)
        if hp.n_sqz > 1:
            x, x_mask = unsqueeze(x, x_mask, hp.n_sqz)
        return x, None

    def block(x, block_params):
        x, _ = coupling_apply(
            block_params["coupling"],
            x,
            x_mask,
            g,
            hp.hidden_channels,
            hp.dilation_rate,
            hp.n_layers,
            sigmoid_scale=hp.sigmoid_scale,
            wn_impl=hp.wn_impl,
            wn_residuals=hp.wn_residuals,
            reverse=True,
            deterministic=True,
        )
        x, _ = invconv_apply(block_params["invconv"], x, x_mask, reverse=True)
        x = actnorm_inv(block_params["actnorm"], x, x_mask)
        return x, None

    if hp.unroll:
        for i in reversed(range(hp.n_blocks)):
            bp = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
            x, _ = block(x, bp)
    else:
        rev_blocks = jax.tree_util.tree_map(lambda a: a[::-1], params["blocks"])
        x, _ = jax.lax.scan(block, x, rev_blocks)
    if hp.n_sqz > 1:
        x, x_mask = unsqueeze(x, x_mask, hp.n_sqz)
    return x, None


def decoder_ddi(
    params: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    hp: DecoderHyper,
    g: typing.Optional[jnp.ndarray] = None,
) -> Params:
    """Data-dependent ActNorm initialization (ddi.py:10-39 + layers.py:207-221).

    Runs one forward pass; each block's ActNorm params are replaced by batch
    statistics of its input before the block is applied.  Returns updated
    decoder params.  Runs deterministically (no dropout) — the reference runs
    with dropout active, which only adds noise to the init statistics.
    """
    if hp.n_sqz > 1:
        x, x_mask = squeeze(x, x_mask, hp.n_sqz)

    def block(x, block_params):
        an = actnorm_ddi_stats(x, x_mask)
        x, _ = actnorm_fwd(an, x, x_mask)
        x, _ = invconv_apply(block_params["invconv"], x, x_mask, reverse=False)
        x, _ = coupling_apply(
            block_params["coupling"],
            x,
            x_mask,
            g,
            hp.hidden_channels,
            hp.dilation_rate,
            hp.n_layers,
            sigmoid_scale=hp.sigmoid_scale,
            wn_impl=hp.wn_impl,
            wn_residuals=hp.wn_residuals,
            reverse=False,
            deterministic=True,
        )
        return x, an

    _, actnorms = jax.lax.scan(block, x, params["blocks"])
    new_blocks = dict(params["blocks"])
    new_blocks["actnorm"] = actnorms
    return {"blocks": new_blocks}


def decoder_store_inverse(params: Params) -> Params:
    """Precompute per-block inverse 1x1 weights for fast inference
    (layers.py:274-275 equivalent; weight-norm folding happens lazily
    in-graph and costs nothing at these sizes)."""
    blocks = dict(params["blocks"])
    inv = jax.vmap(lambda w: jnp.linalg.inv(w.astype(jnp.float32)))(
        blocks["invconv"]["weight"]
    )
    blocks["invconv"] = dict(blocks["invconv"], weight_inv=inv)
    return {"blocks": blocks}
