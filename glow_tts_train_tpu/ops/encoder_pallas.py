"""Fused Pallas kernel for one ENTIRE text-encoder layer (training fwd+bwd).

One encoder layer is MHA (with windowed relative-position embeddings) →
dropout → residual LayerNorm → conv-FFN → dropout → residual LayerNorm
(reference attentions.py:12-74, :148-264, :347-381).  In XLA this is ~30
small ops per layer — tiny matmuls ([t, h] with t≈128, h=192), rel-pos
pad/reshape glue, two layernorms — whose dispatch and relayout overhead
dominates the encoder's step share (~13 ms of the 71 ms b=128 step while
its matmul FLOPs need <1 ms).  This kernel runs the whole layer for one
sample in VMEM; the lax.scan over layers carries only x and saves one
[t, h] residual per layer.

Rel-pos trick: the reference materializes q·rel_k as [t, 2t-1] logits and
index-shifts them into [t, t] (attentions.py:302-333).  With the ±window
table zero-padded beyond the window (get_relative_embeddings), the math is
exactly a banded add — scores[i, j] += q[i]·rel_k[j-i+w] for |j-i| ≤ w —
so the kernel adds 2w+1 masked diagonals of the tiny [t, 2w+1] q·rel_k
product instead of doing the pad/reshape dance (and the same band
extraction replaces absolute_to_relative for the rel-v term).

Backward (custom VJP) recomputes the layer forward in-kernel — the same
measured-winner strategy as the flow-block kernel (BASELINE.md round 3c);
the layer is straight-line code, so every intermediate lives as a local
over the whole walk and all weight-grad accumulators stay VMEM-resident
across the batch grid.  In-kernel dropout draws raw bits from the TPU
hardware PRNG per (sample, layer, site) and replays them bit-identically
in backward — a different stream than the XLA path's jax.random.bits, with
the same keep statistics (policy identical to ops/wn_pallas.py).

Supported shapes: self-attention with shared-across-heads rel-pos window
(the reference encoder's only configuration — attentions.py:178-188).
``block_length``, proximal bias, cross-attention, and window_size=None
fall back to the op-by-op path in attention.encoder_apply.

Cited reference behavior: encoder layer attentions.py:55-73, attention
core :203-264, FFN :368-381, layernorm layers.py:10-28.
"""

import contextlib
import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wn_pallas import _im2col, _offsets, _shifted, _specs

Params = typing.Dict[str, typing.Any]

_LN_EPS = 1e-4  # reference layers.py:14 (nonstandard channel-norm eps)


def _drop_keep(site, shape, st):
    """f32 0/1 keep mask for dropout site ``site``, replayable anywhere
    (seed is per (sample, layer); sites index the draws within a layer).
    Hardware PRNG on TPU; portable hash in interpret mode (wn_pallas
    _keep_bits)."""
    from .wn_pallas import _keep_bits

    seed = st["seed"] * np.int32(st["n_sites"]) + np.int32(site)
    bits = _keep_bits(seed, shape, st)
    return jnp.where(bits >= st["drop_threshold"], 1.0, 0.0)


def _maybe_drop(x, site, st):
    """Apply dropout in f32 (x f32) if active; returns dropped x."""
    if st["drop_threshold"] is None:
        return x
    keep = _drop_keep(site, x.shape, st)
    return x * keep * np.float32(st["drop_scale"])


def _ln_fwd(x, gamma, beta):
    """f32 last-axis layernorm (norms.layer_norm semantics, eps 1e-4).
    Returns (y, xhat, rstd) — the normalized input and inverse std feed
    the closed-form backward."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    xhat = xc * rstd
    return xhat * gamma + beta, xhat, rstd


def _ln_bwd(dy, xhat, rstd, gamma):
    """Standard layernorm backward.  Returns (dx, dgamma, dbeta)."""
    dgamma = jnp.sum(dy * xhat, axis=0)
    dbeta = jnp.sum(dy, axis=0)
    dxhat = dy * gamma
    dx = (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    ) * rstd
    return dx, dgamma, dbeta


def _band_offsets(t):
    """[t, t] i32 matrix of j - i (static per shape)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    return cols - rows


def _layer_fwd_math(x, mask, refs, st, want_locals=False):
    """Shared forward math for ``pack`` packed samples, x [pack·t, h].

    The projection / FFN / layernorm work is row-wise, so ``pack`` samples
    are processed as ONE [pack·t, h] matmul operand — at t≈128 a single
    sample leaves the MXU mostly pipeline-fill (M=128 is one tile-pass);
    packing restores M to an amortizing size.  Only the attention core
    (scores/softmax/band, inherently per-sample [t, t]) loops over the
    ``pack`` segments.  Returns (out, locals); ``locals`` (when requested)
    holds everything the backward chain needs — the layer is straight-line
    so they are plain values, not scratch."""
    (wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
     rk_ref, rv_ref, g1_ref, be1_ref, g2_ref, be2_ref,
     w1_ref, c1_ref, w2_ref, c2_ref) = refs
    P, h = x.shape
    G = st["pack"]
    t = P // G
    H = st["n_heads"]
    d = h // H
    w = st["window"]
    dtype = x.dtype
    scale = np.float32(1.0 / np.sqrt(d))

    maskf = mask.astype(jnp.float32)  # [P, 1]
    xm = (x.astype(jnp.float32) * maskf).astype(dtype)

    q = (
        jnp.dot(xm, wq_ref[...], preferred_element_type=jnp.float32)
        + bq_ref[0][None, :]
    )
    k = (
        jnp.dot(xm, wk_ref[...], preferred_element_type=jnp.float32)
        + bk_ref[0][None, :]
    )
    v = (
        jnp.dot(xm, wv_ref[...], preferred_element_type=jnp.float32)
        + bv_ref[0][None, :]
    )

    offm = _band_offsets(t) if w is not None else None
    ams = []     # per-segment [t, t] pairwise attend masks
    for g in range(G):
        mg = maskf[g * t:(g + 1) * t]
        ams.append(mg * mg[:, 0][None, :])
    head_outs = []  # per-head packed [P, d] attention outputs
    heads = []      # locals per (head, segment) for backward
    y_attn = jnp.zeros((P, h), jnp.float32)
    for hd in range(H):
        s, e = hd * d, (hd + 1) * d
        qh_p = q[:, s:e].astype(dtype)
        kh_p = k[:, s:e].astype(dtype)
        vh_p = v[:, s:e].astype(dtype)
        if w is not None:
            # banded rel-k addition (see module docstring); one packed
            # [P, d]x[d, 2w+1] matmul, sliced per segment below
            qrel_p = jnp.dot(
                qh_p, rk_ref[...].T, preferred_element_type=jnp.float32
            )
        pieces = []
        seg_locs = []
        for g in range(G):
            r0 = g * t
            qh = qh_p[r0:r0 + t]
            kh = kh_p[r0:r0 + t]
            vh = vh_p[r0:r0 + t]
            sc = (
                jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
                * scale
            )
            if w is not None:
                qrel = qrel_p[r0:r0 + t]  # [t, 2w+1]
                for o in range(-w, w + 1):
                    col = qrel[:, o + w][:, None]
                    sc = sc + jnp.where(offm == o, col, 0.0) * scale
            sc = jnp.where(ams[g] == 0.0, np.float32(-1e4), sc)
            # f32 softmax (XLA path computes scores f32 via
            # preferred_element_type then jax.nn.softmax)
            mx = jnp.max(sc, axis=-1, keepdims=True)
            ex = jnp.exp(sc - mx)
            p = ex / jnp.sum(ex, axis=-1, keepdims=True)
            pd = _maybe_drop(p, g * H + hd, st)
            pdt = pd.astype(dtype)
            out_h = jnp.dot(pdt, vh, preferred_element_type=jnp.float32)
            if w is not None:
                for o in range(-w, w + 1):
                    pb = jnp.sum(
                        jnp.where(offm == o, pd, 0.0), axis=1
                    )  # [t]
                    out_h = out_h + pb[:, None] * rv_ref[o + w, :].astype(
                        jnp.float32
                    )[None, :]
            pieces.append(out_h.astype(dtype))
            if want_locals:
                seg_locs.append((p, pdt, qh, kh, vh))
        out_packed = (
            pieces[0] if G == 1 else jnp.concatenate(pieces, axis=0)
        )  # [P, d]
        y_attn = y_attn + jnp.dot(
            out_packed, wo_ref[s:e, :], preferred_element_type=jnp.float32
        )
        if want_locals:
            head_outs.append(out_packed)
            heads.append(seg_locs)

    y = y_attn + bo_ref[0][None, :]
    y = _maybe_drop(y, G * H, st)

    x1_in = xm.astype(jnp.float32) + y
    x1, xhat1, rstd1 = _ln_fwd(x1_in, g1_ref[0][None, :], be1_ref[0][None, :])

    a_in = (x1 * maskf).astype(dtype)
    cols1 = _im2col(a_in, st["offs"], t, G)
    pre = (
        jnp.dot(cols1, w1_ref[...], preferred_element_type=jnp.float32)
        + c1_ref[0][None, :]
    )
    r = jnp.maximum(pre, 0.0)
    r = _maybe_drop(r, G * H + 1, st)
    rm = (r * maskf).astype(dtype)
    cols2 = _im2col(rm, st["offs"], t, G)
    y2 = (
        jnp.dot(cols2, w2_ref[...], preferred_element_type=jnp.float32)
        + c2_ref[0][None, :]
    ) * maskf
    y2 = _maybe_drop(y2, G * H + 2, st)

    x2_in = x1 + y2
    out, xhat2, rstd2 = _ln_fwd(
        x2_in, g2_ref[0][None, :], be2_ref[0][None, :]
    )
    loc = None
    if want_locals:
        loc = {
            "maskf": maskf, "ams": ams, "offm": offm, "xm": xm,
            "heads": heads, "head_outs": head_outs,
            "xhat1": xhat1, "rstd1": rstd1,
            "a_in": a_in, "pre": pre, "rm": rm,
            "xhat2": xhat2, "rstd2": rstd2,
        }
    return out.astype(dtype), loc


def _fwd_kernel(seed_ref, x_ref, mask_ref, *refs_and_out, st):
    refs, out_ref = refs_and_out[:-1], refs_and_out[-1]
    st = dict(st, seed=seed_ref[0] + pl.program_id(0))
    out, _ = _layer_fwd_math(x_ref[0], mask_ref[0], refs, st)
    out_ref[0] = out


def _bwd_kernel(seed_ref, x_ref, mask_ref, *rest, st):
    refs = rest[:18]
    dout_ref = rest[18]
    (dx_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
     dwo_ref, dbo_ref, drk_ref, drv_ref, dg1_ref, dbe1_ref, dg2_ref,
     dbe2_ref, dw1_ref, dc1_ref, dw2_ref, dc2_ref) = rest[19:]
    (wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
     rk_ref, rv_ref, g1_ref, be1_ref, g2_ref, be2_ref,
     w1_ref, c1_ref, w2_ref, c2_ref) = refs

    P, h = x_ref.shape[1], x_ref.shape[2]
    G = st["pack"]
    t = P // G
    H = st["n_heads"]
    d = h // H
    w = st["window"]
    dtype = x_ref.dtype
    scale = np.float32(1.0 / np.sqrt(d))
    st = dict(st, seed=seed_ref[0] + pl.program_id(0))

    @pl.when(pl.program_id(0) == 0)
    def _zero_accs():
        for ref in (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                    dwo_ref, dbo_ref, drk_ref, drv_ref, dg1_ref, dbe1_ref,
                    dg2_ref, dbe2_ref, dw1_ref, dc1_ref, dw2_ref, dc2_ref):
            ref[...] = jnp.zeros_like(ref)

    # ---- forward recompute, keeping every intermediate as a local ----
    _, loc = _layer_fwd_math(x_ref[0], mask_ref[0], refs, st,
                             want_locals=True)
    maskf, ams, offm, xm = loc["maskf"], loc["ams"], loc["offm"], loc["xm"]

    # ---- LN2 / FFN ----
    dout = dout_ref[0].astype(jnp.float32)
    dx2_in, dg2, dbe2 = _ln_bwd(
        dout, loc["xhat2"], loc["rstd2"], g2_ref[0][None, :]
    )
    dg2_ref[0] += dg2
    dbe2_ref[0] += dbe2

    dx1 = dx2_in  # residual branch
    dy2 = dx2_in
    if st["drop_threshold"] is not None:
        keep = _drop_keep(G * H + 2, dy2.shape, st)
        dy2 = dy2 * keep * np.float32(st["drop_scale"])
    dconv2 = dy2 * maskf
    cols2 = _im2col(loc["rm"], st["offs"], t, G)
    dw2_ref[...] += jnp.dot(
        cols2.T, dconv2.astype(dtype), preferred_element_type=jnp.float32
    )
    dc2_ref[0] += jnp.sum(dconv2, axis=0)
    dcols2 = jnp.dot(
        dconv2.astype(dtype), w2_ref[...].T, preferred_element_type=jnp.float32
    )
    f = w1_ref.shape[1]
    drm = jnp.zeros((P, f), jnp.float32)
    for ki, off in enumerate(st["offs"]):
        drm = drm + _shifted(dcols2[:, ki * f:(ki + 1) * f], -off, t, G)
    dr = drm * maskf
    if st["drop_threshold"] is not None:
        keep = _drop_keep(G * H + 1, dr.shape, st)
        dr = dr * keep * np.float32(st["drop_scale"])
    dpre = jnp.where(loc["pre"] > 0.0, dr, 0.0)
    cols1 = _im2col(loc["a_in"], st["offs"], t, G)
    dw1_ref[...] += jnp.dot(
        cols1.T, dpre.astype(dtype), preferred_element_type=jnp.float32
    )
    dc1_ref[0] += jnp.sum(dpre, axis=0)
    dcols1 = jnp.dot(
        dpre.astype(dtype), w1_ref[...].T, preferred_element_type=jnp.float32
    )
    da = jnp.zeros((P, h), jnp.float32)
    for ki, off in enumerate(st["offs"]):
        da = da + _shifted(dcols1[:, ki * h:(ki + 1) * h], -off, t, G)
    dx1 = dx1 + da * maskf

    # ---- LN1 / attention ----
    dx1_in, dg1, dbe1 = _ln_bwd(
        dx1, loc["xhat1"], loc["rstd1"], g1_ref[0][None, :]
    )
    dg1_ref[0] += dg1
    dbe1_ref[0] += dbe1

    dxm = dx1_in  # residual branch
    dy = dx1_in
    if st["drop_threshold"] is not None:
        keep = _drop_keep(G * H, dy.shape, st)
        dy = dy * keep * np.float32(st["drop_scale"])
    dbo_ref[0] += jnp.sum(dy, axis=0)
    dyt = dy.astype(dtype)

    def _cat0(pieces):
        return pieces[0] if G == 1 else jnp.concatenate(pieces, axis=0)

    dq_heads, dk_heads, dv_heads = [], [], []
    for hd in range(H):
        s, e = hd * d, (hd + 1) * d
        out_packed = loc["head_outs"][hd]  # [P, d]
        dwo_ref[s:e, :] += jnp.dot(
            out_packed.T, dyt, preferred_element_type=jnp.float32
        )
        dout_h_p = jnp.dot(
            dyt, wo_ref[s:e, :].T, preferred_element_type=jnp.float32
        )  # [P, d]
        dout_ht_p = dout_h_p.astype(dtype)
        # per-segment attention-core backward; rel-table grads accumulate
        # over segments through ONE packed matmul per diagonal
        dq_segs, dk_segs, dv_segs = [], [], []
        qh_segs = []
        pb_segs = {o: [] for o in range(-w, w + 1)} if w is not None else {}
        dqrel_segs = (
            {o: [] for o in range(-w, w + 1)} if w is not None else {}
        )
        for g in range(G):
            r0 = g * t
            p, pdt, qh, kh, vh = loc["heads"][hd][g]
            qh_segs.append(qh)
            dout_h = dout_h_p[r0:r0 + t]
            dout_ht = dout_ht_p[r0:r0 + t]
            dpd = jnp.dot(
                dout_ht, vh.T, preferred_element_type=jnp.float32
            )  # [t, t]
            dv_segs.append(
                jnp.dot(pdt.T, dout_ht, preferred_element_type=jnp.float32)
            )
            if w is not None:
                pdf = pdt.astype(jnp.float32)
                for o in range(-w, w + 1):
                    rv_row = rv_ref[o + w, :].astype(jnp.float32)
                    d_pb = jnp.sum(dout_h * rv_row[None, :], axis=1)  # [t]
                    dpd = dpd + jnp.where(offm == o, d_pb[:, None], 0.0)
                    # [1, t] row (lane-axis concat below: Mosaic has no
                    # 1-D vector concatenate)
                    pb_segs[o].append(
                        jnp.sum(jnp.where(offm == o, pdf, 0.0), axis=1)[
                            None, :
                        ]
                    )
            if st["drop_threshold"] is not None:
                keep = _drop_keep(g * H + hd, dpd.shape, st)
                dpd = dpd * keep * np.float32(st["drop_scale"])
            # f32 softmax backward on the pre-dropout probabilities
            ds = p * (dpd - jnp.sum(dpd * p, axis=-1, keepdims=True))
            ds = jnp.where(ams[g] == 0.0, 0.0, ds)
            dst = ds.astype(dtype)
            dqh = (
                jnp.dot(dst, kh, preferred_element_type=jnp.float32) * scale
            )
            dkh = (
                jnp.dot(dst.T, qh, preferred_element_type=jnp.float32)
                * scale
            )
            if w is not None:
                for o in range(-w, w + 1):
                    dqrel = jnp.sum(
                        jnp.where(offm == o, ds, 0.0), axis=1
                    ) * scale  # [t]
                    rk_row = rk_ref[o + w, :].astype(jnp.float32)
                    dqh = dqh + dqrel[:, None] * rk_row[None, :]
                    dqrel_segs[o].append(dqrel[None, :])  # [1, t] row
            dq_segs.append(dqh)
            dk_segs.append(dkh)
        if w is not None:
            qh_packed = _cat0(qh_segs).astype(jnp.float32)  # [P, d]

            def _cat_rows(pieces):  # [1, t] rows -> [1, P] (lane concat)
                return (
                    pieces[0]
                    if G == 1
                    else jnp.concatenate(pieces, axis=1)
                )

            for o in range(-w, w + 1):
                pb_p = _cat_rows(pb_segs[o])  # [1, P]
                drv_ref[o + w, :] += jnp.dot(
                    pb_p, dout_h_p, preferred_element_type=jnp.float32
                )[0]
                dqrel_p = _cat_rows(dqrel_segs[o])  # [1, P]
                drk_ref[o + w, :] += jnp.dot(
                    dqrel_p, qh_packed, preferred_element_type=jnp.float32
                )[0]
        dq_heads.append(_cat0(dq_segs))
        dk_heads.append(_cat0(dk_segs))
        dv_heads.append(_cat0(dv_segs))

    dQ = jnp.concatenate(dq_heads, axis=1)
    dK = jnp.concatenate(dk_heads, axis=1)
    dV = jnp.concatenate(dv_heads, axis=1)

    for dM, wref, dwref, dbref in (
        (dQ, wq_ref, dwq_ref, dbq_ref),
        (dK, wk_ref, dwk_ref, dbk_ref),
        (dV, wv_ref, dwv_ref, dbv_ref),
    ):
        dMt = dM.astype(dtype)
        dwref[...] += jnp.dot(
            xm.T, dMt, preferred_element_type=jnp.float32
        )
        dbref[0] += jnp.sum(dM, axis=0)
        dxm = dxm + jnp.dot(
            dMt, wref[...].T, preferred_element_type=jnp.float32
        )

    dx_ref[0] = (dxm * maskf).astype(dx_ref.dtype)


# pack override hook for tests/benchmarks: [None] = auto (largest
# divisor of the local batch from _PACK_CANDIDATES)
_PACK_OVERRIDE: typing.List[typing.Optional[int]] = [None]
_PACK_CANDIDATES = (4, 2, 1)  # 8 measured neutral-to-worse on v5e (bwd
# locals overflow the 16M default scoped-VMEM class); 4 is the best point
_PACK_MAX_ROWS = 2048  # cap pack·t (VMEM: intermediates scale with rows)


def _pick_pack(b: int, t: int) -> int:
    """Samples per grid step: largest candidate dividing the (local)
    batch with pack·t within the row cap.  M=t≈128 rows alone is mostly
    MXU pipeline fill; packing restores an amortizing matmul height.
    Packed segments are concatenated on the sublane (row) axis, so t must
    be sublane-aligned (Mosaic rejects misaligned concatenates)."""
    if _PACK_OVERRIDE[0] is not None:
        return _PACK_OVERRIDE[0]
    if t % 8 != 0:
        return 1
    for g in _PACK_CANDIDATES:
        if b % g == 0 and g * t <= _PACK_MAX_ROWS:
            return g
    return 1


@contextlib.contextmanager
def force_pack(g: typing.Optional[int]):
    """Pin the sample-pack factor (tests/A-B); None restores auto."""
    prev = _PACK_OVERRIDE[0]
    _PACK_OVERRIDE[0] = g
    try:
        yield
    finally:
        _PACK_OVERRIDE[0] = prev


def _encoder_layer_call(weights, x, mask, seed_f, *, st, interpret,
                        with_grad=False, dout=None):
    from .shardwrap import shard_per_sample

    K = len(st["offs"])

    def impl(seed_f, x, mask, *rest):
        b, t, h = x.shape
        weights = rest[:18]
        # pack is STATIC in st (baked into the custom_vjp fn key at call
        # construction, encoder_layer_fused_folded) so the forward and the
        # lazily-traced backward can never disagree on it
        G = st["pack"] if b % st["pack"] == 0 else 1
        P = G * t
        gb = b // G  # grid size: G samples per step
        st2 = dict(st, pack=G, n_sites=G * st["n_heads"] + 3)
        if G > 1:
            x = x.reshape(gb, P, h)
            mask = mask.reshape(gb, P, 1)
        m0 = weights[8].shape[0]  # rel table rows (2w+1)
        f = weights[14].shape[1]
        const, per_b = _specs()

        w_specs = [
            const((h, h)), const((1, h)),       # wq, bq
            const((h, h)), const((1, h)),       # wk, bk
            const((h, h)), const((1, h)),       # wv, bv
            const((h, h)), const((1, h)),       # wo, bo
            const((m0, h // st["n_heads"])),    # rel_k
            const((m0, h // st["n_heads"])),    # rel_v
            const((1, h)), const((1, h)),       # ln1 gamma/beta
            const((1, h)), const((1, h)),       # ln2 gamma/beta
            const((K * h, f)), const((1, f)),   # ffn W1, b1
            const((K * f, h)), const((1, h)),   # ffn W2, b2
        ]
        in_specs = [per_b((1, P, h)), per_b((1, P, 1))] + w_specs
        args = [x, mask, *weights]

        if not with_grad:
            kernel = functools.partial(_fwd_kernel, st=st2)
            out = pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(gb,),
                    in_specs=in_specs,
                    out_specs=per_b((1, P, h)),
                ),
                out_shape=jax.ShapeDtypeStruct((gb, P, h), x.dtype),
                interpret=interpret,
            )(seed_f, *args)
            return out.reshape(b, t, h) if G > 1 else out

        kernel = functools.partial(_bwd_kernel, st=st2)
        d = h // st["n_heads"]
        out_shapes = (
            jax.ShapeDtypeStruct((gb, P, h), x.dtype),       # dx
            jax.ShapeDtypeStruct((h, h), jnp.float32),        # dwq
            jax.ShapeDtypeStruct((1, h), jnp.float32),        # dbq
            jax.ShapeDtypeStruct((h, h), jnp.float32),        # dwk
            jax.ShapeDtypeStruct((1, h), jnp.float32),        # dbk
            jax.ShapeDtypeStruct((h, h), jnp.float32),        # dwv
            jax.ShapeDtypeStruct((1, h), jnp.float32),        # dbv
            jax.ShapeDtypeStruct((h, h), jnp.float32),        # dwo
            jax.ShapeDtypeStruct((1, h), jnp.float32),        # dbo
            jax.ShapeDtypeStruct((m0, d), jnp.float32),       # drk
            jax.ShapeDtypeStruct((m0, d), jnp.float32),       # drv
            jax.ShapeDtypeStruct((1, h), jnp.float32),        # dg1
            jax.ShapeDtypeStruct((1, h), jnp.float32),        # dbe1
            jax.ShapeDtypeStruct((1, h), jnp.float32),        # dg2
            jax.ShapeDtypeStruct((1, h), jnp.float32),        # dbe2
            jax.ShapeDtypeStruct((K * h, f), jnp.float32),    # dw1
            jax.ShapeDtypeStruct((1, f), jnp.float32),        # dc1
            jax.ShapeDtypeStruct((K * f, h), jnp.float32),    # dw2
            jax.ShapeDtypeStruct((1, h), jnp.float32),        # dc2
        )
        out_specs = (
            per_b((1, P, h)),
            const((h, h)), const((1, h)),
            const((h, h)), const((1, h)),
            const((h, h)), const((1, h)),
            const((h, h)), const((1, h)),
            const((m0, d)), const((m0, d)),
            const((1, h)), const((1, h)),
            const((1, h)), const((1, h)),
            const((K * h, f)), const((1, f)),
            const((K * f, h)), const((1, h)),
        )
        dout_in = rest[18]
        if G > 1:
            dout_in = dout_in.reshape(gb, P, h)
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(gb,),
                in_specs=in_specs + [per_b((1, P, h))],
                out_specs=out_specs,
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(seed_f, *args, dout_in)
        if G > 1:
            outs = (outs[0].reshape(b, t, h),) + tuple(outs[1:])
        return outs

    call_args = (seed_f, x, mask, *weights)
    in_dims = [None, 0, 0] + [None] * 18
    if not with_grad:
        out_dims = 0
    else:
        call_args += (dout,)
        in_dims.append(0)
        out_dims = (0,) + (None,) * 18
    return shard_per_sample(
        impl, call_args, b=x.shape[0], in_dims=in_dims, out_dims=out_dims,
        seed_arg=0,
    )


class _EncKey(typing.NamedTuple):
    st: tuple
    interpret: bool


def _st_from_key(key: "_EncKey") -> dict:
    n_heads, window, offs, thr, sc = key.st[:5]
    pack = key.st[5] if len(key.st) > 5 else 1
    return {
        "n_heads": n_heads,
        "window": window,
        "offs": offs,
        "drop_threshold": thr,
        "drop_scale": sc,
        "pack": pack,
        "n_sites": pack * n_heads + 3,
    }


@functools.lru_cache(maxsize=None)
def _make_layer_fn(key: "_EncKey"):
    """custom_vjp encoder-layer function per static config (same seed-as-
    argument discipline as wn_pallas/block_pallas)."""
    interpret = key.interpret
    st = dict(_st_from_key(key), interpret=interpret)

    @jax.custom_vjp
    def fn(weights, x, mask, seed_f):
        return _encoder_layer_call(
            weights, x, mask, seed_f, st=st, interpret=interpret
        )

    def fn_fwd(weights, x, mask, seed_f):
        return fn(weights, x, mask, seed_f), (weights, x, mask, seed_f)

    def fn_bwd(res, dout):
        weights, x, mask, seed_f = res
        grads = _encoder_layer_call(
            weights, x, mask, seed_f, st=st, interpret=interpret,
            with_grad=True, dout=dout,
        )
        dx = grads[0]
        dweights = tuple(
            g.astype(w.dtype) for g, w in zip(grads[1:], weights)
        )
        return (dweights, dx, jnp.zeros_like(mask),
                np.zeros((1,), dtype=jax.dtypes.float0))

    fn.defvjp(fn_fwd, fn_bwd)
    return fn


def fold_encoder_layer(layer_params: Params, dtype) -> tuple:
    """Layer params → flat kernel-weight tuple (all reshapes/casts, no
    compute — autodiff maps cotangents straight back).  Order matches
    ``_layer_fwd_math``'s refs."""
    at = layer_params["attn"]
    ffn = layer_params["ffn"]
    w1 = ffn["conv_1"]["w"]  # [K, h, f]
    w2 = ffn["conv_2"]["w"]  # [K, f, h]
    K, h, f = w1.shape

    def cw(conv):  # 1x1 conv weight [1, i, o] -> [i, o]
        return conv["w"][0].astype(dtype)

    def cb(conv):
        return conv["b"].astype(jnp.float32).reshape(1, -1)

    def ln(p):
        return (
            p["gamma"].astype(jnp.float32).reshape(1, -1),
            p["beta"].astype(jnp.float32).reshape(1, -1),
        )

    g1, be1 = ln(layer_params["norm_1"])
    g2, be2 = ln(layer_params["norm_2"])
    return (
        cw(at["q"]), cb(at["q"]),
        cw(at["k"]), cb(at["k"]),
        cw(at["v"]), cb(at["v"]),
        cw(at["o"]), cb(at["o"]),
        at["emb_rel_k"][0].astype(dtype),
        at["emb_rel_v"][0].astype(dtype),
        g1, be1, g2, be2,
        w1.reshape(K * h, f).astype(dtype), cb(ffn["conv_1"]),
        w2.reshape(K * f, h).astype(dtype), cb(ffn["conv_2"]),
    )


def fold_encoder_layers(params: Params, dtype) -> tuple:
    """Batched fold for ALL stacked layers (leading n_layers axis), run
    outside the layer scan — same reasoning as flows.fold_blocks_stacked:
    per-iteration folds become DUS-stacked scan residuals."""
    return jax.vmap(lambda p: fold_encoder_layer(p, dtype))(params)


def encoder_layer_fused(
    layer_params: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    n_heads: int,
    window_size: int,
    kernel_size: int,
    p_dropout: float = 0.0,
    rng: typing.Optional[jax.Array] = None,
    deterministic: bool = True,
    interpret: typing.Optional[bool] = None,
) -> jnp.ndarray:
    """One encoder layer through the fused kernel (convenience wrapper for
    single-layer callers/tests; encoder_apply pre-folds all layers)."""
    weights = fold_encoder_layer(layer_params, x.dtype)
    return encoder_layer_fused_folded(
        weights, x, x_mask, n_heads=n_heads, window_size=window_size,
        kernel_size=kernel_size, p_dropout=p_dropout, rng=rng,
        deterministic=deterministic, interpret=interpret,
    )


def encoder_layer_fused_folded(
    weights: tuple,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    n_heads: int,
    window_size: int,
    kernel_size: int,
    p_dropout: float = 0.0,
    rng: typing.Optional[jax.Array] = None,
    deterministic: bool = True,
    interpret: typing.Optional[bool] = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = x.shape[0]
    drop = (not deterministic) and p_dropout > 0.0 and rng is not None
    if drop:
        seed = jax.random.randint(
            rng, (), minval=0, maxval=np.int32(2 ** 31 - 1), dtype=jnp.int32
        )
    else:
        seed = jnp.zeros((), jnp.int32)
    seed_f = jnp.asarray(seed, jnp.int32).reshape((1,))

    # resolve the sample-pack factor against the LOCAL batch (after any
    # ambient-mesh batch split) and bake it into the static kernel key —
    # forward and the lazily-traced backward must agree on it
    from .shardwrap import _split_axes, ambient_mesh

    local_b = b
    mesh = ambient_mesh()
    if mesh is not None:
        _, prod = _split_axes(mesh, b)
        local_b = b // prod
    st = (
        int(n_heads),
        int(window_size),
        _offsets(kernel_size, 1),
        (
            np.uint32(min(round(p_dropout * 2 ** 32), 2 ** 32 - 1))
            if drop
            else None
        ),
        (1.0 / (1.0 - p_dropout)) if drop else 1.0,
        _pick_pack(local_b, x.shape[1]),
    )
    fn = _make_layer_fn(_EncKey(st, interpret))
    mask = jnp.broadcast_to(x_mask.astype(x.dtype), (b, x.shape[1], 1))
    return fn(weights, x, mask, seed_f)
