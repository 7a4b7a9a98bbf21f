"""Fused Pallas kernel for one ENTIRE flow block (training forward).

One flow-decoder block is ActNorm → InvConvNear → affine coupling
(reference models.py:193-211; layers.py:173-275; attentions.py:77-145).
After the WN gated stack moved into a fused kernel (ops/wn_pallas.py) the
remaining per-block XLA ops — the actnorm affine, the dense invconv
matmul, the coupling start/end 1x1 convs, the affine transform, and the
logdet reduction — still pay dot_general dispatch and reshape/relayout
glue per block.  This kernel runs the whole block for one sample in VMEM;
the lax.scan over blocks carries only (z, logdet) and saves one [t, c]
residual per block.  Measured on v5e (base config): 75.12 → 73.78 ms/step
at b=128 (+1.8%), 111.22 → 110.57 ms at b=192 (+0.6%) — XLA already
overlapped most of the glue, but the fused block is never slower and is
the "auto" default wherever the fused WN kernel is.

Key trick: ActNorm and InvConvNear compose into ONE affine map, folded
OUTSIDE the kernel in differentiable JAX (autodiff handles their params):

    z_pre = (actnorm(x) applied mask) @ M^T * mask
          = (x @ A + bA) * mask,   A = diag(e^logs) @ M^T,  bA = bias @ M^T

with M the dense [c, c] expansion of the s x s invconv mix
(ops/flows._invconv_dense).  Their logdets depend only on weights and
x_len, so they also stay outside.  In-kernel per sample [t, c]:

    zp       = (x @ A + bA) * mask
    x0, x1   = zp[:, :c/2], zp[:, c/2:]
    h0       = (x0 @ W_start + b_start) * mask
    skip     = WN_stack(h0)                      (ops/wn_pallas layer loop)
    out      = (skip * mask) @ W_end + b_end
    m, logs  = out[:, :c/2], out[:, c/2:]        (+ optional sigmoid_scale)
    z1       = (m + e^logs * x1) * mask
    z        = concat(x0, z1);   ld = sum(logs * mask)

Backward (custom VJP) has two strategies, mirroring ops/wn_pallas.py:
``residuals="recompute"`` re-runs the forward in-kernel then walks back
through end → WN reverse walk → start → the folded A matmul;
``residuals="store"`` saves the WN per-layer inputs/gates plus the two
block-level intermediates backward cannot cheaply rebuild (zp — the
post-affine split point — and skipm — the end conv's input) to HBM in
forward, so backward skips the recompute entirely (round-4 measured
winner with UNROLLED blocks: under lax.scan the saved residuals become
DUS-stacked scan outputs and recompute wins — BASELINE.md rounds 3c/4).
All weight-gradient accumulators stay VMEM-resident across the batch
grid in both modes; dropout keep masks are never stored (backward
replays them from the PRNG).

Cited reference behavior: coupling forward/logdet attentions.py:119-142,
actnorm layers.py:182-199, invconv layers.py:238-272.
"""

import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wn_pallas import (
    _layer_fwd,
    _offsets,
    _regen_keep,
    _reverse_walk,
    _specs,
    _zero_weight_accs,
    fold_wn_weights,
    params_kernel_size,
)

Params = typing.Dict[str, typing.Any]


def _apply_logs_transform(logs_raw, sigmoid_scale):
    """Optional coupling reparam (attentions.py:131-132), f32 in-kernel."""
    if sigmoid_scale:
        return jnp.log(1e-6 + jax.nn.sigmoid(logs_raw + 2.0))
    return logs_raw


def _block_fwd_math(x, mask, refs, st, *, collect=None):
    """Shared forward math for one sample.  Returns (z, ld, locals) where
    ``locals`` holds the intermediates backward needs (zp, h0, skipm, out).
    ``collect``: optional (xs_scratch, th_scratch, sg_scratch, keep_scratch)
    to stash WN per-layer values during the pass (backward reuse)."""
    (a_ref, ba_ref, ws_ref, bs_ref, we_ref, be_ref,
     win_ref, bin_ref, wrs_ref, brs_ref, g_ref) = refs
    t, c = x.shape
    c2 = c // 2
    h = ws_ref.shape[1]
    dtype = x.dtype
    maskf = mask.astype(jnp.float32)

    zp = (
        jnp.dot(x, a_ref[...], preferred_element_type=jnp.float32)
        + ba_ref[0].astype(jnp.float32)[None, :]
    ) * maskf
    zp = zp.astype(dtype)
    x0, x1 = zp[:, :c2], zp[:, c2:]

    h0 = (
        (
            jnp.dot(x0, ws_ref[...], preferred_element_type=jnp.float32)
            + bs_ref[0].astype(jnp.float32)[None, :]
        )
        * maskf
    ).astype(dtype)

    wn_refs = (win_ref, bin_ref, wrs_ref, brs_ref, g_ref, mask)
    xcur = h0
    skip = jnp.zeros((t, h), jnp.float32)
    for l in range(st["n_layers"]):
        if collect is not None:
            collect[0][l] = xcur
        xcur, skip_inc, (th, sg, keepf) = _layer_fwd(xcur, l, wn_refs, st)
        if collect is not None:
            collect[1][l] = th.astype(dtype)
            collect[2][l] = sg.astype(dtype)
            # store-mode collect is length 3: keep masks are replayed from
            # the PRNG in backward, never written to HBM
            if keepf is not None and len(collect) > 3:
                collect[3][l] = keepf.astype(dtype)
        skip = skip + skip_inc.astype(jnp.float32)
    skipm = (skip.astype(dtype) * mask).astype(dtype)

    out = (
        jnp.dot(skipm, we_ref[...], preferred_element_type=jnp.float32)
        + be_ref[0].astype(jnp.float32)[None, :]
    ).astype(dtype)
    m = out[:, :c2].astype(jnp.float32)
    logs_raw = out[:, c2:].astype(jnp.float32)
    logs = _apply_logs_transform(logs_raw, st["sigmoid_scale"])

    z1 = (m + jnp.exp(logs) * x1.astype(jnp.float32)) * maskf
    z = jnp.concatenate([x0, z1.astype(dtype)], axis=1)
    ld = jnp.sum(logs * maskf)
    return z, ld, {
        "zp": zp, "x0": x0, "x1": x1, "h0": h0, "skipm": skipm,
        "logs": logs, "logs_raw": logs_raw, "maskf": maskf,
    }


def _block_fwd_kernel(seed_ref, x_ref, mask_ref, a_ref, ba_ref, ws_ref,
                      bs_ref, we_ref, be_ref, win_ref, bin_ref, wrs_ref,
                      brs_ref, g_ref, z_ref, ld_ref, *, st):
    st = dict(st, seed=seed_ref[0] + pl.program_id(0))
    refs = (a_ref, ba_ref, ws_ref, bs_ref, we_ref, be_ref,
            win_ref, bin_ref, wrs_ref, brs_ref, g_ref)
    z, ld, _ = _block_fwd_math(x_ref[0], mask_ref[0], refs, st)
    z_ref[0] = z.astype(z_ref.dtype)
    # Mosaic needs the last two block dims (8, 128)-aligned: pad the scalar
    # logdet to one [8, 128] tile per sample (caller reads [:, 0, 0])
    ld_ref[0] = jnp.full((8, 128), ld, jnp.float32)


class _SaveView:
    """Adapter so _block_fwd_math's collect protocol (``view[l] = value``)
    can target a per-sample ``[1, L, t, h]`` output block instead of the
    recompute kernel's ``[L, t, h]`` VMEM scratch."""

    def __init__(self, ref):
        self._ref = ref

    def __setitem__(self, l, value):
        self._ref[0, l] = value

    def __len__(self):  # collect tuples are length-checked, not the views
        raise TypeError("_SaveView has no length")


def _block_fwd_save_kernel(seed_ref, x_ref, mask_ref, a_ref, ba_ref, ws_ref,
                           bs_ref, we_ref, be_ref, win_ref, bin_ref, wrs_ref,
                           brs_ref, g_ref, z_ref, ld_ref, zp_ref, skipm_ref,
                           xs_ref, th_ref, sg_ref, *, st):
    """Forward that additionally writes the store-mode residuals to HBM:
    the WN per-layer inputs + gates (xs/th/sg, as wn_pallas._fwd_save_kernel)
    plus zp (the post-affine split point — yields x0/x1 without re-running
    the A matmul) and skipm (the end conv's input — rebuilding it would
    cost L res_skip matmuls).  out/m/logs are NOT stored: backward
    recomputes them from skipm with one [t, h]x[h, c] matmul."""
    st = dict(st, seed=seed_ref[0] + pl.program_id(0))
    refs = (a_ref, ba_ref, ws_ref, bs_ref, we_ref, be_ref,
            win_ref, bin_ref, wrs_ref, brs_ref, g_ref)
    collect = (_SaveView(xs_ref), _SaveView(th_ref), _SaveView(sg_ref))
    z, ld, loc = _block_fwd_math(
        x_ref[0], mask_ref[0], refs, st, collect=collect
    )
    z_ref[0] = z.astype(z_ref.dtype)
    ld_ref[0] = jnp.full((8, 128), ld, jnp.float32)
    zp_ref[0] = loc["zp"]
    skipm_ref[0] = loc["skipm"]


def _zero_block_grad_accs(da_ref, dba_ref, dws_ref, dbs_ref, dwe_ref,
                          dbe_ref):
    """Zero the block-level weight-grad accumulators on the first grid
    step (they accumulate across the batch grid in VMEM)."""

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for ref in (da_ref, dba_ref, dws_ref, dbs_ref, dwe_ref, dbe_ref):
            ref[...] = jnp.zeros_like(ref)


def _block_bwd_math(load, x, mask, x0, x1f, skipm, logs_raw, logs,
                    dz_ref, dld_ref, a_ref, ws_ref, we_ref, win_ref, wrs_ref,
                    dx_ref, da_ref, dba_ref, dws_ref, dbs_ref, dwe_ref,
                    dbe_ref, dwin_ref, dbin_ref, dwrs_ref, dbrs_ref, dg_ref,
                    *, st, t, h, dtype):
    """Backward math shared by the recompute and store kernels: affine
    coupling + end conv → WN reverse walk → start conv → folded A.  The
    two kernels differ only in where the forward intermediates come from
    (in-kernel recompute locals vs HBM-stored residuals); ``load(l)``
    yields the per-layer WN values from whichever source."""
    c2 = x0.shape[1]
    maskf = mask.astype(jnp.float32)
    e_logs = jnp.exp(logs)

    # ---- affine coupling + end conv ----
    dz = dz_ref[0].astype(jnp.float32)
    dld = dld_ref[0, 0, 0]
    dz0 = dz[:, :c2]
    dz1m = dz[:, c2:] * maskf
    dm = dz1m
    dlogs = dz1m * e_logs * x1f + dld * maskf  # ld = sum(logs * mask)
    if st["sigmoid_scale"]:
        # logs = log(1e-6 + sig(s+2)):  dlogs/ds = sig'(s+2)/(1e-6+sig(s+2))
        sgm = jax.nn.sigmoid(logs_raw + 2.0)
        dlogs = dlogs * (sgm * (1.0 - sgm)) / (1e-6 + sgm)
    dout = jnp.concatenate([dm, dlogs], axis=1)  # [t, c] f32
    dwe_ref[...] += jnp.dot(
        skipm.T, dout.astype(dtype), preferred_element_type=jnp.float32
    )
    dbe_ref[0] += jnp.sum(dout, axis=0)
    dskip = (
        jnp.dot(dout.astype(dtype), we_ref[...].T,
                preferred_element_type=jnp.float32)
        * maskf
    )  # cotangent of raw skip sum (skipm = skip * mask)

    # ---- WN reverse walk ----
    dh0 = _reverse_walk(
        load, mask, dskip.astype(dtype), win_ref, wrs_ref,
        dwin_ref, dbin_ref, dwrs_ref, dbrs_ref, dg_ref,
        st=st, t=t, h=h, dtype=dtype,
    )

    # ---- start conv:  h0 = (x0 @ W_s + b_s) * mask ----
    d_pre = dh0 * maskf
    dws_ref[...] += jnp.dot(
        x0.T, d_pre.astype(dtype), preferred_element_type=jnp.float32
    )
    dbs_ref[0] += jnp.sum(d_pre, axis=0)
    dx0 = dz0 + jnp.dot(
        d_pre.astype(dtype), ws_ref[...].T, preferred_element_type=jnp.float32
    )
    dx1 = dz1m * e_logs

    # ---- folded actnorm∘invconv:  zp = (x @ A + bA) * mask ----
    dzp = jnp.concatenate([dx0, dx1], axis=1) * maskf
    da_ref[...] += jnp.dot(
        x.T, dzp.astype(dtype), preferred_element_type=jnp.float32
    )
    dba_ref[0] += jnp.sum(dzp, axis=0)
    dx_ref[0] = jnp.dot(
        dzp.astype(dtype), a_ref[...].T, preferred_element_type=jnp.float32
    ).astype(dx_ref.dtype)


def _block_bwd_store_kernel(seed_ref, x_ref, mask_ref, a_ref, ws_ref,
                            we_ref, be_ref, win_ref, wrs_ref,
                            zp_ref, skipm_ref, xs_ref, th_ref, sg_ref,
                            dz_ref, dld_ref,
                            dx_ref, da_ref, dba_ref, dws_ref, dbs_ref,
                            dwe_ref, dbe_ref, dwin_ref, dbin_ref, dwrs_ref,
                            dbrs_ref, dg_ref, *, st):
    """Backward from forward-saved residuals: no recompute pass at all —
    loads zp/skipm/xs/th/sg from HBM, rebuilds out/m/logs from skipm with
    one [t, h]x[h, c] matmul, then runs the shared _block_bwd_math walk;
    dropout keep masks are replayed from the PRNG."""
    t, c = x_ref.shape[1], x_ref.shape[2]
    c2 = c // 2
    h = ws_ref.shape[1]
    dtype = x_ref.dtype
    mask = mask_ref[0]
    st = dict(st, seed=seed_ref[0] + pl.program_id(0))

    _zero_weight_accs(dwin_ref, dbin_ref, dwrs_ref, dbrs_ref)
    _zero_block_grad_accs(da_ref, dba_ref, dws_ref, dbs_ref, dwe_ref,
                          dbe_ref)

    zp = zp_ref[0]
    x0, x1 = zp[:, :c2], zp[:, c2:]
    skipm = skipm_ref[0]
    # recompute out/m/logs from the stored skipm — EXACTLY the forward's
    # op order (dot f32 + bias, cast to dtype, then f32 slices)
    out = (
        jnp.dot(skipm, we_ref[...], preferred_element_type=jnp.float32)
        + be_ref[0].astype(jnp.float32)[None, :]
    ).astype(dtype)
    logs_raw = out[:, c2:].astype(jnp.float32)
    logs = _apply_logs_transform(logs_raw, st["sigmoid_scale"])

    def load(l):  # HBM-stored residuals; keep masks replayed from the PRNG
        keepf = (
            _regen_keep(l, (t, 2 * h), st)
            if st["drop_threshold"] is not None
            else None
        )
        return (
            xs_ref[0, l],
            th_ref[0, l].astype(jnp.float32),
            sg_ref[0, l].astype(jnp.float32),
            keepf,
        )

    _block_bwd_math(
        load, x_ref[0], mask, x0, x1.astype(jnp.float32), skipm,
        logs_raw, logs, dz_ref, dld_ref, a_ref, ws_ref, we_ref, win_ref,
        wrs_ref, dx_ref, da_ref, dba_ref, dws_ref, dbs_ref, dwe_ref,
        dbe_ref, dwin_ref, dbin_ref, dwrs_ref, dbrs_ref, dg_ref,
        st=st, t=t, h=h, dtype=dtype,
    )


def _block_bwd_kernel(seed_ref, x_ref, mask_ref, a_ref, ba_ref, ws_ref,
                      bs_ref, we_ref, be_ref, win_ref, bin_ref, wrs_ref,
                      brs_ref, g_ref, dz_ref, dld_ref,
                      dx_ref, da_ref, dba_ref, dws_ref, dbs_ref, dwe_ref,
                      dbe_ref, dwin_ref, dbin_ref, dwrs_ref, dbrs_ref,
                      dg_ref, xs_ref, th_ref, sg_ref, keep_ref, *, st):
    t, c = x_ref.shape[1], x_ref.shape[2]
    h = ws_ref.shape[1]
    dtype = x_ref.dtype
    mask = mask_ref[0]
    st = dict(st, seed=seed_ref[0] + pl.program_id(0))
    refs = (a_ref, ba_ref, ws_ref, bs_ref, we_ref, be_ref,
            win_ref, bin_ref, wrs_ref, brs_ref, g_ref)

    _zero_weight_accs(dwin_ref, dbin_ref, dwrs_ref, dbrs_ref)
    _zero_block_grad_accs(da_ref, dba_ref, dws_ref, dbs_ref, dwe_ref,
                          dbe_ref)

    # ---- forward recompute (WN per-layer values stashed in scratch) ----
    collect = (xs_ref, th_ref, sg_ref, keep_ref)
    _, _, loc = _block_fwd_math(x_ref[0], mask, refs, st, collect=collect)

    def load(l):  # recompute-mode loads from VMEM scratch
        keepf = (
            keep_ref[l].astype(jnp.float32)
            if st["drop_threshold"] is not None
            else None
        )
        return (
            xs_ref[l],
            th_ref[l].astype(jnp.float32),
            sg_ref[l].astype(jnp.float32),
            keepf,
        )

    _block_bwd_math(
        load, x_ref[0], mask, loc["x0"], loc["x1"].astype(jnp.float32),
        loc["skipm"], loc["logs_raw"], loc["logs"], dz_ref, dld_ref,
        a_ref, ws_ref, we_ref, win_ref, wrs_ref, dx_ref, da_ref, dba_ref,
        dws_ref, dbs_ref, dwe_ref, dbe_ref, dwin_ref, dbin_ref, dwrs_ref,
        dbrs_ref, dg_ref, st=st, t=t, h=h, dtype=dtype,
    )


def _flow_block_call(
    A, bA, W_s, b_s, W_e, b_e, W_in, b_in, W_rs, b_rs, x, x_mask, g_all,
    seed_f, *, st, interpret, with_grad=False, dz=None, dld=None,
    mode="fwd",
):
    from .shardwrap import shard_per_sample

    L = st["n_layers"]

    def impl(seed_f, x, x_mask, A, bA, W_s, b_s, W_e, b_e, W_in, b_in,
             W_rs, b_rs, g_all, *rest):
        b, t, c = x.shape
        h = W_s.shape[1]
        Kh = W_in.shape[1]
        const, per_b = _specs()

        in_specs = [
            per_b((1, t, c)),        # x
            per_b((1, t, 1)),        # mask
            const((c, c)),           # A
            const((1, c)),           # bA
            const((c // 2, h)),      # W_start
            const((1, h)),           # b_start
            const((h, c)),           # W_end
            const((1, c)),           # b_end
            const((L, Kh, 2 * h)),   # W_in
            const((L, 2 * h)),       # b_in
            const((L, h, 2 * h)),    # W_rs
            const((L, 2 * h)),       # b_rs
            per_b((1, L, 2 * h)),    # g
        ]
        args = [x, x_mask, A, bA, W_s, b_s, W_e, b_e, W_in, b_in, W_rs,
                b_rs, g_all]

        if not with_grad and mode == "fwd_save":
            kernel = functools.partial(_block_fwd_save_kernel, st=st)
            res = per_b((1, L, t, h))
            return pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(b,),
                    in_specs=in_specs,
                    out_specs=(
                        per_b((1, t, c)), per_b((1, 8, 128)),
                        per_b((1, t, c)), per_b((1, t, h)),
                        res, res, res,
                    ),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((b, t, c), x.dtype),
                    jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),   # ld
                    jax.ShapeDtypeStruct((b, t, c), x.dtype),         # zp
                    jax.ShapeDtypeStruct((b, t, h), x.dtype),         # skipm
                    jax.ShapeDtypeStruct((b, L, t, h), x.dtype),      # xs
                    jax.ShapeDtypeStruct((b, L, t, h), x.dtype),      # tanh
                    jax.ShapeDtypeStruct((b, L, t, h), x.dtype),      # sigmoid
                ),
                interpret=interpret,
            )(seed_f, *args)

        if not with_grad:
            kernel = functools.partial(_block_fwd_kernel, st=st)
            return pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(b,),
                    in_specs=in_specs,
                    out_specs=(per_b((1, t, c)), per_b((1, 8, 128))),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((b, t, c), x.dtype),
                    jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),  # ld
                ),
                interpret=interpret,
            )(seed_f, *args)

        kernel = functools.partial(_block_bwd_kernel, st=st)
        out_shapes = (
            jax.ShapeDtypeStruct((b, t, c), x.dtype),           # dx
            jax.ShapeDtypeStruct((c, c), jnp.float32),           # dA
            jax.ShapeDtypeStruct((1, c), jnp.float32),           # dbA
            jax.ShapeDtypeStruct((c // 2, h), jnp.float32),      # dW_start
            jax.ShapeDtypeStruct((1, h), jnp.float32),           # db_start
            jax.ShapeDtypeStruct((h, c), jnp.float32),           # dW_end
            jax.ShapeDtypeStruct((1, c), jnp.float32),           # db_end
            jax.ShapeDtypeStruct((L, Kh, 2 * h), jnp.float32),   # dW_in
            jax.ShapeDtypeStruct((L, 2 * h), jnp.float32),       # db_in
            jax.ShapeDtypeStruct((L, h, 2 * h), jnp.float32),    # dW_rs
            jax.ShapeDtypeStruct((L, 2 * h), jnp.float32),       # db_rs
            jax.ShapeDtypeStruct((b, L, 2 * h), jnp.float32),    # dg
        )
        out_specs = (
            per_b((1, t, c)),
            const((c, c)),
            const((1, c)),
            const((c // 2, h)),
            const((1, h)),
            const((h, c)),
            const((1, c)),
            const((L, Kh, 2 * h)),
            const((L, 2 * h)),
            const((L, h, 2 * h)),
            const((L, 2 * h)),
            per_b((1, L, 2 * h)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b,),
                in_specs=in_specs + [per_b((1, t, c)), per_b((1, 8, 128))],
                out_specs=out_specs,
                scratch_shapes=[
                    pltpu.VMEM((L, t, h), x.dtype),       # xs (layer inputs)
                    pltpu.VMEM((L, t, h), x.dtype),       # tanh gate
                    pltpu.VMEM((L, t, h), x.dtype),       # sigmoid gate
                    pltpu.VMEM((L, t, 2 * h), x.dtype),   # dropout keep
                ],
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(seed_f, *args, rest[0], rest[1])

    call_args = (seed_f, x, x_mask, A, bA, W_s, b_s, W_e, b_e, W_in, b_in,
                 W_rs, b_rs, g_all)
    in_dims = [None, 0, 0] + [None] * 10 + [0]
    if not with_grad:
        out_dims = (0,) * 7 if mode == "fwd_save" else (0, 0)
    else:
        call_args += (dz, dld)
        in_dims += [0, 0]
        out_dims = (0,) + (None,) * 10 + (0,)
    return shard_per_sample(
        impl, call_args, b=x.shape[0], in_dims=in_dims, out_dims=out_dims,
        seed_arg=0,
    )


def _block_bwd_store_call(
    A, W_s, W_e, b_e, W_in, W_rs, x, x_mask, zp, skipm, xs, th, sg,
    dz, dld, seed_f, *, st, interpret,
):
    """Backward pallas_call for residual-store mode (weights the walk
    actually touches only; bias grads are reductions of the cotangents)."""
    from .shardwrap import shard_per_sample

    L = st["n_layers"]

    def impl(seed_f, x, x_mask, A, W_s, W_e, b_e, W_in, W_rs,
             zp, skipm, xs, th, sg, dz, dld):
        b, t, c = x.shape
        h = W_s.shape[1]
        Kh = W_in.shape[1]
        const, per_b = _specs()
        res = per_b((1, L, t, h))
        in_specs = [
            per_b((1, t, c)),        # x
            per_b((1, t, 1)),        # mask
            const((c, c)),           # A
            const((c // 2, h)),      # W_start
            const((h, c)),           # W_end
            const((1, c)),           # b_end
            const((L, Kh, 2 * h)),   # W_in
            const((L, h, 2 * h)),    # W_rs
            per_b((1, t, c)),        # zp
            per_b((1, t, h)),        # skipm
            res, res, res,           # xs, th, sg
            per_b((1, t, c)),        # dz
            per_b((1, 8, 128)),      # dld
        ]
        out_shapes = (
            jax.ShapeDtypeStruct((b, t, c), x.dtype),           # dx
            jax.ShapeDtypeStruct((c, c), jnp.float32),           # dA
            jax.ShapeDtypeStruct((1, c), jnp.float32),           # dbA
            jax.ShapeDtypeStruct((c // 2, h), jnp.float32),      # dW_start
            jax.ShapeDtypeStruct((1, h), jnp.float32),           # db_start
            jax.ShapeDtypeStruct((h, c), jnp.float32),           # dW_end
            jax.ShapeDtypeStruct((1, c), jnp.float32),           # db_end
            jax.ShapeDtypeStruct((L, Kh, 2 * h), jnp.float32),   # dW_in
            jax.ShapeDtypeStruct((L, 2 * h), jnp.float32),       # db_in
            jax.ShapeDtypeStruct((L, h, 2 * h), jnp.float32),    # dW_rs
            jax.ShapeDtypeStruct((L, 2 * h), jnp.float32),       # db_rs
            jax.ShapeDtypeStruct((b, L, 2 * h), jnp.float32),    # dg
        )
        out_specs = (
            per_b((1, t, c)),
            const((c, c)),
            const((1, c)),
            const((c // 2, h)),
            const((1, h)),
            const((h, c)),
            const((1, c)),
            const((L, Kh, 2 * h)),
            const((L, 2 * h)),
            const((L, h, 2 * h)),
            const((L, 2 * h)),
            per_b((1, L, 2 * h)),
        )
        kernel = functools.partial(_block_bwd_store_kernel, st=st)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b,),
                in_specs=in_specs,
                out_specs=out_specs,
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(seed_f, x, x_mask, A, W_s, W_e, b_e, W_in, W_rs, zp, skipm,
          xs, th, sg, dz, dld)

    return shard_per_sample(
        impl,
        (seed_f, x, x_mask, A, W_s, W_e, b_e, W_in, W_rs, zp, skipm,
         xs, th, sg, dz, dld),
        b=x.shape[0],
        in_dims=[None, 0, 0] + [None] * 6 + [0] * 7,
        out_dims=(0,) + (None,) * 10 + (0,),
        seed_arg=0,
    )


class _BlockKey(typing.NamedTuple):
    st: tuple
    interpret: bool
    residuals: str = "recompute"  # inverse kernel ignores this


def _st_from_key(key: "_BlockKey") -> dict:
    n_layers, offs, thr, scale, sigmoid_scale = key.st
    return {
        "n_layers": n_layers,
        "offs": offs,
        "drop_threshold": thr,
        "drop_scale": scale,
        "sigmoid_scale": sigmoid_scale,
    }


@functools.lru_cache(maxsize=None)
def _make_block_fn(key: "_BlockKey"):
    """custom_vjp flow-block function per static config (same seed-as-
    argument discipline as wn_pallas._make_fused_fn).  ``key.residuals``
    picks the backward strategy: "recompute" re-runs the forward in the
    backward kernel; "store" saves zp/skipm/xs/th/sg to HBM in forward and
    backward skips the recompute (see module docstring for the trade)."""
    interpret = key.interpret
    st = dict(_st_from_key(key), interpret=interpret)
    store = key.residuals == "store"

    @jax.custom_vjp
    def f(A, bA, W_s, b_s, W_e, b_e, W_in, b_in, W_rs, b_rs, x, x_mask,
          g_all, seed_f):
        z, ld = _flow_block_call(
            A, bA, W_s, b_s, W_e, b_e, W_in, b_in, W_rs, b_rs, x, x_mask,
            g_all, seed_f, st=st, interpret=interpret,
        )
        return z, ld[:, 0, 0]

    def f_fwd(A, bA, W_s, b_s, W_e, b_e, W_in, b_in, W_rs, b_rs, x, x_mask,
              g_all, seed_f):
        if store:
            z, ld, zp, skipm, xs, th, sg = _flow_block_call(
                A, bA, W_s, b_s, W_e, b_e, W_in, b_in, W_rs, b_rs, x,
                x_mask, g_all, seed_f, st=st, interpret=interpret,
                mode="fwd_save",
            )
            # The store backward never reads bA/b_s/b_in/b_rs/g_all values
            # (bias grads are cotangent reductions; g enters via the saved
            # gate products), so don't keep those tensors alive from
            # forward to backward — carry zero-length [0, *shape] stubs
            # that preserve the cotangent dtype+shape (same trick as
            # wn_pallas._make_fused_fn).
            stubs = tuple(
                jnp.zeros((0,) + a.shape, a.dtype)
                for a in (bA, b_s, b_e, b_in, b_rs, g_all)
            )
            return (z, ld[:, 0, 0]), (
                A, W_s, W_e, b_e, W_in, W_rs, x, x_mask, seed_f,
                zp, skipm, xs, th, sg, stubs,
            )
        out = f(A, bA, W_s, b_s, W_e, b_e, W_in, b_in, W_rs, b_rs, x,
                x_mask, g_all, seed_f)
        return out, (A, bA, W_s, b_s, W_e, b_e, W_in, b_in, W_rs, b_rs, x,
                     x_mask, g_all, seed_f)

    def f_bwd(res, cot):
        dz, dld = cot
        if store:
            (A, W_s, W_e, b_e, W_in, W_rs, x, x_mask, seed_f,
             zp, skipm, xs, th, sg, stubs) = res
            bA_st, bs_st, be_st, bin_st, brs_st, g_st = stubs
        else:
            (A, bA, W_s, b_s, W_e, b_e, W_in, b_in, W_rs, b_rs, x, x_mask,
             g_all, seed_f) = res
            bA_st, bs_st, be_st = bA, b_s, b_e
            bin_st, brs_st, g_st = b_in, b_rs, g_all
        b = x.shape[0]
        dld_pad = jnp.broadcast_to(
            dld.astype(jnp.float32)[:, None, None], (b, 8, 128)
        )
        if store:
            (dx, dA, dbA, dws, dbs, dwe, dbe, dwin, dbin, dwrs, dbrs,
             dg) = _block_bwd_store_call(
                A, W_s, W_e, b_e, W_in, W_rs, x, x_mask, zp, skipm,
                xs, th, sg, dz, dld_pad, seed_f, st=st, interpret=interpret,
            )
        else:
            (dx, dA, dbA, dws, dbs, dwe, dbe, dwin, dbin, dwrs, dbrs,
             dg) = _flow_block_call(
                A, bA, W_s, b_s, W_e, b_e, W_in, b_in, W_rs, b_rs, x,
                x_mask, g_all, seed_f, st=st, interpret=interpret,
                with_grad=True, dz=dz, dld=dld_pad,
            )
        # stubs carry (dtype, shape) for the primals store mode drops: a
        # stub's shape[-a.ndim:] (== shape[1:] for stubs) is the primal's
        bA_shape = bA_st.shape[1:] if store else bA_st.shape
        bs_shape = bs_st.shape[1:] if store else bs_st.shape
        be_shape = be_st.shape[1:] if store else be_st.shape
        return (
            dA.astype(A.dtype),
            dbA[0].astype(bA_st.dtype).reshape(bA_shape),
            dws.astype(W_s.dtype),
            dbs[0].astype(bs_st.dtype).reshape(bs_shape),
            dwe.astype(W_e.dtype),
            dbe[0].astype(be_st.dtype).reshape(be_shape),
            dwin.astype(W_in.dtype),
            dbin.astype(bin_st.dtype),
            dwrs.astype(W_rs.dtype),
            dbrs.astype(brs_st.dtype),
            dx,
            jnp.zeros_like(x_mask),
            dg.astype(g_st.dtype),
            np.zeros((1,), dtype=jax.dtypes.float0),
        )

    f.defvjp(f_fwd, f_bwd)
    return f


def _block_inv_kernel(seed_ref, x_ref, mask_ref, ai_ref, bai_ref, ws_ref,
                      bs_ref, we_ref, be_ref, win_ref, bin_ref, wrs_ref,
                      brs_ref, g_ref, y_ref, *, st):
    """Inverse of one flow block (inference, z → mel domain), per sample:

        x0, x1   = x[:, :c/2], x[:, c/2:]
        h0       = (x0 @ W_start + b_start) * mask
        skip     = WN_stack(h0)                 (identical forward stack —
                                                 the coupling net runs
                                                 FORWARD in both directions,
                                                 attentions.py:119-142)
        out      = (skip * mask) @ W_end + b_end
        m, logs  = out[:, :c/2], out[:, c/2:]   (+ optional sigmoid_scale)
        z1       = (x1 − m) · e^{−logs} · mask
        y        = (concat(x0, z1) @ A⁻ + bA⁻) * mask

    with (A⁻, bA⁻) the folded inverse of invconv ∘ actnorm (see
    fold_block_params_inverse).  Deterministic — inference never drops."""
    del seed_ref  # uniform call shape with the forward kernel; no dropout
    x = x_ref[0]
    mask = mask_ref[0]
    t, c = x.shape
    c2 = c // 2
    h = ws_ref.shape[1]
    dtype = x.dtype
    maskf = mask.astype(jnp.float32)

    x0, x1 = x[:, :c2], x[:, c2:]
    h0 = (
        (
            jnp.dot(x0, ws_ref[...], preferred_element_type=jnp.float32)
            + bs_ref[0].astype(jnp.float32)[None, :]
        )
        * maskf
    ).astype(dtype)

    wn_refs = (win_ref, bin_ref, wrs_ref, brs_ref, g_ref, mask)
    xcur = h0
    skip = jnp.zeros((t, h), jnp.float32)
    for l in range(st["n_layers"]):
        xcur, skip_inc, _ = _layer_fwd(xcur, l, wn_refs, st)
        skip = skip + skip_inc.astype(jnp.float32)
    skipm = (skip.astype(dtype) * mask).astype(dtype)

    out = (
        jnp.dot(skipm, we_ref[...], preferred_element_type=jnp.float32)
        + be_ref[0].astype(jnp.float32)[None, :]
    ).astype(dtype)
    m = out[:, :c2].astype(jnp.float32)
    logs = _apply_logs_transform(
        out[:, c2:].astype(jnp.float32), st["sigmoid_scale"]
    )
    z1 = (x1.astype(jnp.float32) - m) * jnp.exp(-logs) * maskf
    z = jnp.concatenate([x0, z1.astype(dtype)], axis=1)

    y = (
        jnp.dot(z, ai_ref[...], preferred_element_type=jnp.float32)
        + bai_ref[0].astype(jnp.float32)[None, :]
    ) * maskf
    y_ref[0] = y.astype(y_ref.dtype)


@functools.lru_cache(maxsize=None)
def _make_block_inv_fn(key: "_BlockKey"):
    interpret = key.interpret
    st = dict(_st_from_key(key), interpret=interpret)

    def impl(seed_f, x, x_mask, A_inv, bA_inv, W_s, b_s, W_e, b_e, W_in,
             b_in, W_rs, b_rs, g_all):
        b, t, c = x.shape
        L = st["n_layers"]
        h = W_s.shape[1]
        Kh = W_in.shape[1]
        const, per_b = _specs()
        in_specs = [
            per_b((1, t, c)),        # x
            per_b((1, t, 1)),        # mask
            const((c, c)),           # A_inv
            const((1, c)),           # bA_inv
            const((c // 2, h)),      # W_start
            const((1, h)),           # b_start
            const((h, c)),           # W_end
            const((1, c)),           # b_end
            const((L, Kh, 2 * h)),   # W_in
            const((L, 2 * h)),       # b_in
            const((L, h, 2 * h)),    # W_rs
            const((L, 2 * h)),       # b_rs
            per_b((1, L, 2 * h)),    # g
        ]
        kernel = functools.partial(_block_inv_kernel, st=st)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b,),
                in_specs=in_specs,
                out_specs=per_b((1, t, c)),
            ),
            out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
            interpret=interpret,
        )(seed_f, x, x_mask, A_inv, bA_inv, W_s, b_s, W_e, b_e, W_in, b_in,
          W_rs, b_rs, g_all)

    def f(A_inv, bA_inv, W_s, b_s, W_e, b_e, W_in, b_in, W_rs, b_rs, x,
          x_mask, g_all, seed_f):
        from .shardwrap import shard_per_sample

        return shard_per_sample(
            impl,
            (seed_f, x, x_mask, A_inv, bA_inv, W_s, b_s, W_e, b_e, W_in,
             b_in, W_rs, b_rs, g_all),
            b=x.shape[0],
            in_dims=[None, 0, 0] + [None] * 10 + [0],
            out_dims=0,
            seed_arg=0,
        )

    return f


def fold_block_params(block_params: Params, n_layers: int, n_split: int,
                      dtype) -> dict:
    """Block params → direct kernel weights, all in differentiable JAX
    (autodiff routes the folded-weight cotangents back to actnorm logs/bias,
    the s x s invconv weight, and the weight-normed start conv)."""
    from .flows import _invconv_dense
    from .conv import weight_norm_effective

    an = block_params["actnorm"]
    w_inv = block_params["invconv"]["weight"].astype(jnp.float32)
    cp = block_params["coupling"]

    ws_full = weight_norm_effective(cp["start"])  # [1, c/2, h]
    c = 2 * ws_full.shape[1]
    m = _invconv_dense(w_inv, c, n_split)  # [c, c]; z = x @ M^T
    scale = jnp.exp(an["logs"].astype(jnp.float32))  # [c]
    A = (scale[:, None] * m.T).astype(dtype)
    bA = (an["bias"].astype(jnp.float32) @ m.T).reshape(1, c)

    W_in, b_in, W_rs, b_rs = fold_wn_weights(cp["wn"], n_layers, dtype)
    return {
        "A": A,
        "bA": bA,
        "W_s": ws_full[0].astype(dtype),
        "b_s": cp["start"]["b"].astype(jnp.float32).reshape(1, -1),
        "W_e": cp["end"]["w"][0].astype(dtype),
        "b_e": cp["end"]["b"].astype(jnp.float32).reshape(1, -1),
        "W_in": W_in,
        "b_in": b_in,
        "W_rs": W_rs,
        "b_rs": b_rs,
    }


def fold_blocks_stacked(
    blocks: Params,
    n_layers: int,
    n_split: int,
    dtype,
    g: typing.Optional[jnp.ndarray],
    hidden_channels: int,
) -> tuple:
    """Batched weight fold for ALL stacked flow blocks at once, run OUTSIDE
    the block scan.  Folding inside the scan body makes the folded weights
    per-iteration scan residuals (12 serial rounds of small matmuls whose
    saves stack via dynamic_update_slice — ~5 ms/step of DUS in the b=192
    profile); one vmapped fold produces the same stacked tensors directly.

    Returns ``(folded, logs_sum, logabsdet, g_all)`` with leading n_blocks
    axes: the kernel-weight dict, Σlogs (actnorm logdet coefficient),
    log|det W| (invconv logdet coefficient), and the per-block conditioning
    bias [nb, b, L, 2h] (zeros when g is None)."""
    from .conv import conv1d

    def one(bp):
        folded = fold_block_params(bp, n_layers, n_split, dtype)
        logs_sum = jnp.sum(bp["actnorm"]["logs"].astype(jnp.float32))
        _, logabsdet = jnp.linalg.slogdet(
            bp["invconv"]["weight"].astype(jnp.float32)
        )
        if g is not None:
            g_all = conv1d(g, bp["coupling"]["wn"]["cond"]).astype(dtype)
            g_all = g_all.reshape(g.shape[0], n_layers, 2 * hidden_channels)
        else:
            g_all = jnp.zeros((1, n_layers, 2 * hidden_channels), dtype)
        return folded, logs_sum, logabsdet, g_all

    return jax.vmap(one)(blocks)


def fold_block_params_inverse(block_params: Params, n_layers: int,
                              n_split: int, dtype) -> dict:
    """Block params → direct kernel weights for the INVERSE direction.

    The block inverse applies coupling⁻¹, then invconv⁻¹ (u = z @ Minv^T,
    Minv the dense expansion of the stored/computed s×s inverse —
    layers.py:255-259), then actnorm⁻¹ (y = (u − bias)·e^{−logs},
    layers.py:193-195).  The last two compose into one affine:

        y = z @ A⁻ + bA⁻,   A⁻ = Minv^T · diag(e^{−logs}),
                            bA⁻ = −bias · e^{−logs}

    Uses ``weight_inv`` when present (store_inverse, models.py:213-215);
    otherwise inverts at trace time — same policy as invconv_apply."""
    from .flows import _invconv_dense
    from .conv import weight_norm_effective

    an = block_params["actnorm"]
    inv = block_params["invconv"]
    w_inv = inv.get("weight_inv")
    if w_inv is None:
        w_inv = jnp.linalg.inv(inv["weight"].astype(jnp.float32))
    cp = block_params["coupling"]

    ws_full = weight_norm_effective(cp["start"])  # [1, c/2, h]
    c = 2 * ws_full.shape[1]
    minv = _invconv_dense(w_inv.astype(jnp.float32), c, n_split)  # [c, c]
    e = jnp.exp(-an["logs"].astype(jnp.float32))  # [c]
    A_inv = (minv.T * e[None, :]).astype(dtype)
    bA_inv = (-(an["bias"].astype(jnp.float32)) * e).reshape(1, c)

    W_in, b_in, W_rs, b_rs = fold_wn_weights(cp["wn"], n_layers, dtype)
    return {
        "A": A_inv,
        "bA": bA_inv,
        "W_s": ws_full[0].astype(dtype),
        "b_s": cp["start"]["b"].astype(jnp.float32).reshape(1, -1),
        "W_e": cp["end"]["w"][0].astype(dtype),
        "b_e": cp["end"]["b"].astype(jnp.float32).reshape(1, -1),
        "W_in": W_in,
        "b_in": b_in,
        "W_rs": W_rs,
        "b_rs": b_rs,
    }


def fold_blocks_stacked_inverse(
    blocks: Params,
    n_layers: int,
    n_split: int,
    dtype,
    g: typing.Optional[jnp.ndarray],
    hidden_channels: int,
) -> tuple:
    """Batched inverse-direction weight fold for ALL stacked blocks, run
    outside the reverse scan (same DUS-avoidance rationale as
    fold_blocks_stacked).  Returns ``(folded, g_all)``."""
    from .conv import conv1d

    def one(bp):
        folded = fold_block_params_inverse(bp, n_layers, n_split, dtype)
        if g is not None:
            g_all = conv1d(g, bp["coupling"]["wn"]["cond"]).astype(dtype)
            g_all = g_all.reshape(g.shape[0], n_layers, 2 * hidden_channels)
        else:
            g_all = jnp.zeros((1, n_layers, 2 * hidden_channels), dtype)
        return folded, g_all

    return jax.vmap(one)(blocks)


def flow_block_inv_fused_folded(
    folded: dict,
    g_all: jnp.ndarray,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    kernel_size: int,
    dilation_rate: int,
    n_layers: int,
    sigmoid_scale: bool = False,
    interpret: typing.Optional[bool] = None,
) -> jnp.ndarray:
    """Inverse of one flow block from pre-folded kernel weights (one Pallas
    kernel per block per sample; see _block_inv_kernel).  Deterministic —
    the reference's inference path never applies dropout
    (models.py:203-211 with reverse=True)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b, t, c = x.shape
    if g_all.shape[0] != b:  # the no-conditioning placeholder [1, L, 2h]
        g_all = jnp.broadcast_to(g_all, (b,) + g_all.shape[1:])
    seed_f = jnp.zeros((1,), jnp.int32)

    st = (
        n_layers,
        tuple(
            _offsets(kernel_size, dilation_rate ** l)
            for l in range(n_layers)
        ),
        None,
        1.0,
        bool(sigmoid_scale),
    )
    fn = _make_block_inv_fn(_BlockKey(st, interpret))
    mask = jnp.broadcast_to(x_mask.astype(x.dtype), (b, t, 1))
    return fn(
        folded["A"], folded["bA"], folded["W_s"], folded["b_s"],
        folded["W_e"], folded["b_e"], folded["W_in"], folded["b_in"],
        folded["W_rs"], folded["b_rs"], x, mask, g_all, seed_f,
    )


def flow_block_fused_folded(
    folded: dict,
    g_all: jnp.ndarray,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    kernel_size: int,
    dilation_rate: int,
    n_layers: int,
    sigmoid_scale: bool = False,
    p_dropout: float = 0.0,
    rng: typing.Optional[jax.Array] = None,
    deterministic: bool = True,
    interpret: typing.Optional[bool] = None,
    residuals: str = "recompute",
) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
    """Training-forward of one flow block from pre-folded kernel weights.

    Returns ``(z, ld_coupling)`` — the block output [b, t, c] and the
    coupling's per-sample logdet Σ logs·mask [b] (f32).  The actnorm and
    invconv logdet terms depend only on weights and x_len and stay in the
    caller (flows.decoder_fwd).  Inference/reverse and DDI use the op-by-op
    path (they run once, not per step).  ``residuals``: backward strategy —
    "recompute" (in-kernel forward recompute) or "store" (forward saves
    zp/skipm/xs/th/sg to HBM; pair with UNROLLED blocks or the residuals
    become DUS-stacked scan outputs — BASELINE.md round 4)."""
    assert residuals in ("recompute", "store"), residuals
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b, t, c = x.shape
    drop = (not deterministic) and p_dropout > 0.0 and rng is not None

    if g_all.shape[0] != b:  # the no-conditioning placeholder [1, L, 2h]
        g_all = jnp.broadcast_to(g_all, (b,) + g_all.shape[1:])

    if drop:
        seed = jax.random.randint(
            rng, (), minval=0, maxval=np.int32(2 ** 31 - 1), dtype=jnp.int32
        )
    else:
        seed = jnp.zeros((), jnp.int32)
    seed_f = jnp.asarray(seed, jnp.int32).reshape((1,))

    st = (
        n_layers,
        tuple(
            _offsets(kernel_size, dilation_rate ** l)
            for l in range(n_layers)
        ),
        (
            np.uint32(min(round(p_dropout * 2 ** 32), 2 ** 32 - 1))
            if drop
            else None
        ),
        (1.0 / (1.0 - p_dropout)) if drop else 1.0,
        bool(sigmoid_scale),
    )
    fn = _make_block_fn(_BlockKey(st, interpret, residuals))
    mask = jnp.broadcast_to(x_mask.astype(x.dtype), (b, t, 1))
    z, ld = fn(
        folded["A"], folded["bA"], folded["W_s"], folded["b_s"],
        folded["W_e"], folded["b_e"], folded["W_in"], folded["b_in"],
        folded["W_rs"], folded["b_rs"], x, mask, g_all, seed_f,
    )
    return z, ld


def flow_block_fused(
    block_params: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    g: typing.Optional[jnp.ndarray],
    *,
    hidden_channels: int,
    dilation_rate: int,
    n_layers: int,
    n_split: int,
    sigmoid_scale: bool = False,
    p_dropout: float = 0.0,
    rng: typing.Optional[jax.Array] = None,
    deterministic: bool = True,
    interpret: typing.Optional[bool] = None,
    residuals: str = "recompute",
) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
    """One-block convenience wrapper: fold this block's weights, then run
    the fused kernel (see flow_block_fused_folded).  decoder_fwd uses the
    stacked pre-fold instead; this entry serves single-block callers and
    tests."""
    from .conv import conv1d

    b = x.shape[0]
    h = hidden_channels
    folded = fold_block_params(block_params, n_layers, n_split, x.dtype)
    wn_params = block_params["coupling"]["wn"]
    if g is not None:
        g_all = conv1d(g, wn_params["cond"]).astype(x.dtype)
        g_all = g_all.reshape(b, n_layers, 2 * h)
    else:
        g_all = jnp.zeros((b, n_layers, 2 * h), x.dtype)
    return flow_block_fused_folded(
        folded, g_all, x, x_mask,
        kernel_size=params_kernel_size(wn_params),
        dilation_rate=dilation_rate, n_layers=n_layers,
        sigmoid_scale=sigmoid_scale, p_dropout=p_dropout, rng=rng,
        deterministic=deterministic, interpret=interpret,
        residuals=residuals,
    )
