"""Fused Pallas kernels for the text-side conv stacks (prenet + duration
predictor), training fwd+bwd.

After the encoder layers moved into a fused kernel (ops/encoder_pallas.py)
the remaining op-by-op text-side work is two small conv stacks:

* ConvReluNorm prenet (reference layers.py:31-80): 3x [conv k=5 (h->h) ->
  layernorm -> relu -> dropout], then a residual zero-init 1x1 projection.
* DurationPredictor (reference models.py:21-51): 2x [conv k (c->f) ->
  relu -> layernorm -> dropout] (note the flipped relu/norm order vs the
  prenet), then a 1x1 projection to one channel.

Each runs ~15 tiny XLA ops per step on [b, t_x~128, 192..448] tensors —
matmul FLOPs well under a millisecond, cost dominated by dispatch and
relayout glue.  Each stack here is ONE Pallas kernel per sample in VMEM
with a custom-VJP backward (in-kernel forward recompute, VMEM-resident
weight-grad accumulators — the same measured-winner strategy as
wn/block/encoder kernels).  The duration predictor's final 1-channel
projection stays OUTSIDE the kernel: a [t, 1] output tile is lane-hostile
on the TPU, and XLA fuses the single matmul fine.

In-kernel dropout draws raw bits from the TPU hardware PRNG per
(sample, site) and replays them bit-identically in backward — a different
stream than the XLA path's jax.random.bits, same keep statistics (policy
identical to ops/wn_pallas.py).

Cited reference behavior: prenet layers.py:54-80 (norm BEFORE relu),
duration predictor models.py:41-51 (relu BEFORE norm), both with masked
conv inputs.
"""

import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .encoder_pallas import _drop_keep, _ln_bwd, _ln_fwd
from .wn_pallas import _im2col, _offsets, _shifted, _specs

Params = typing.Dict[str, typing.Any]


def _maybe_drop(x, site, st):
    if st["drop_threshold"] is None:
        return x, None
    keep = _drop_keep(site, x.shape, st)
    return x * keep * np.float32(st["drop_scale"]), keep


def _conv_bwd(dpre, cols, w_ref, dw_ref, db_ref, maskf, offs, t, c, dtype,
              idx=None):
    """Shared k-tap conv backward: accumulate weight grads, return the
    masked input cotangent.  ``idx``: optional leading index into stacked
    weight refs (prenet layers share one [L, K*c, c] ref)."""
    dpret = dpre.astype(dtype)
    if idx is None:
        dw_ref[...] += jnp.dot(cols.T, dpret, preferred_element_type=jnp.float32)
        db_ref[0] += jnp.sum(dpre, axis=0)
        w = w_ref[...]
    else:
        dw_ref[idx] += jnp.dot(cols.T, dpret, preferred_element_type=jnp.float32)
        db_ref[idx] += jnp.sum(dpre, axis=0)
        w = w_ref[idx]
    dcols = jnp.dot(dpret, w.T, preferred_element_type=jnp.float32)
    dxm = jnp.zeros((t, c), jnp.float32)
    for ki, off in enumerate(offs):
        dxm = dxm + _shifted(dcols[:, ki * c:(ki + 1) * c], -off, t)
    return dxm * maskf


# ---------------------------------------------------------------------------
# ConvReluNorm prenet
# ---------------------------------------------------------------------------


def _prenet_fwd_math(x, mask, refs, st, want_locals=False):
    """Per-sample [t, h] prenet forward.  Layer order (layers.py:63-72):
    conv(x*mask) -> layernorm -> relu -> dropout; then residual proj."""
    (w_ref, b_ref, ga_ref, be_ref, wp_ref, bp_ref) = refs
    t, h = x.shape
    dtype = x.dtype
    maskf = mask.astype(jnp.float32)
    x0f = x.astype(jnp.float32)

    locs = []
    xcur = x
    for l in range(st["n_layers"]):
        xm = (xcur.astype(jnp.float32) * maskf).astype(dtype)
        cols = _im2col(xm, st["offs"], t)
        pre = (
            jnp.dot(cols, w_ref[l], preferred_element_type=jnp.float32)
            + b_ref[l].astype(jnp.float32)[None, :]
        )
        y, xhat, rstd = _ln_fwd(
            pre, ga_ref[l].astype(jnp.float32)[None, :],
            be_ref[l].astype(jnp.float32)[None, :],
        )
        r = jnp.maximum(y, 0.0)
        o, keep = _maybe_drop(r, l, st)
        if want_locals:
            locs.append({"xm": xm, "xhat": xhat, "rstd": rstd, "y": y,
                         "keep": keep})
        xcur = o.astype(dtype)

    xl = xcur
    out = (
        x0f
        + jnp.dot(xl, wp_ref[...], preferred_element_type=jnp.float32)
        + bp_ref[0].astype(jnp.float32)[None, :]
    ) * maskf
    return out.astype(dtype), (locs, xl)


def _prenet_fwd_kernel(seed_ref, x_ref, mask_ref, w_ref, b_ref, ga_ref,
                       be_ref, wp_ref, bp_ref, out_ref, *, st):
    st = dict(st, seed=seed_ref[0] + pl.program_id(0))
    refs = (w_ref, b_ref, ga_ref, be_ref, wp_ref, bp_ref)
    out, _ = _prenet_fwd_math(x_ref[0], mask_ref[0], refs, st)
    out_ref[0] = out


def _prenet_bwd_kernel(seed_ref, x_ref, mask_ref, w_ref, b_ref, ga_ref,
                       be_ref, wp_ref, bp_ref, dout_ref,
                       dx_ref, dw_ref, db_ref, dga_ref, dbe_ref, dwp_ref,
                       dbp_ref, *, st):
    t, h = x_ref.shape[1], x_ref.shape[2]
    dtype = x_ref.dtype
    mask = mask_ref[0]
    maskf = mask.astype(jnp.float32)
    st = dict(st, seed=seed_ref[0] + pl.program_id(0))
    refs = (w_ref, b_ref, ga_ref, be_ref, wp_ref, bp_ref)

    @pl.when(pl.program_id(0) == 0)
    def _zero_accs():
        for ref in (dw_ref, db_ref, dga_ref, dbe_ref, dwp_ref, dbp_ref):
            ref[...] = jnp.zeros_like(ref)

    _, (locs, xl) = _prenet_fwd_math(x_ref[0], mask, refs, st,
                                     want_locals=True)

    dmasked = dout_ref[0].astype(jnp.float32) * maskf
    dwp_ref[...] += jnp.dot(
        xl.T, dmasked.astype(dtype), preferred_element_type=jnp.float32
    )
    dbp_ref[0] += jnp.sum(dmasked, axis=0)
    dxl = jnp.dot(
        dmasked.astype(dtype), wp_ref[...].T,
        preferred_element_type=jnp.float32,
    )

    for l in reversed(range(st["n_layers"])):
        loc = locs[l]
        dr = dxl
        if loc["keep"] is not None:
            dr = dr * loc["keep"] * np.float32(st["drop_scale"])
        dy = jnp.where(loc["y"] > 0.0, dr, 0.0)
        dpre, dga, dbe = _ln_bwd(
            dy, loc["xhat"], loc["rstd"],
            ga_ref[l].astype(jnp.float32)[None, :],
        )
        dga_ref[l] += dga
        dbe_ref[l] += dbe
        cols = _im2col(loc["xm"], st["offs"], t)
        dxl = _conv_bwd(dpre, cols, w_ref, dw_ref, db_ref, maskf,
                        st["offs"], t, h, dtype, idx=l)

    dx_ref[0] = (dxl + dmasked).astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# Duration predictor stack (without the final 1-channel projection)
# ---------------------------------------------------------------------------


def _dp_fwd_math(x, mask, refs, st, want_locals=False):
    """Per-sample [t, c] duration-predictor stack: 2x conv(x*mask) ->
    relu -> layernorm -> dropout (models.py:41-51)."""
    (w1_ref, b1_ref, g1_ref, be1_ref, w2_ref, b2_ref, g2_ref, be2_ref) = refs
    t = x.shape[0]
    dtype = x.dtype
    maskf = mask.astype(jnp.float32)

    locs = []
    xcur = x
    for l, (w_r, b_r, g_r, be_r) in enumerate((
        (w1_ref, b1_ref, g1_ref, be1_ref),
        (w2_ref, b2_ref, g2_ref, be2_ref),
    )):
        xm = (xcur.astype(jnp.float32) * maskf).astype(dtype)
        cols = _im2col(xm, st["offs"], t)
        pre = (
            jnp.dot(cols, w_r[...], preferred_element_type=jnp.float32)
            + b_r[0].astype(jnp.float32)[None, :]
        )
        r = jnp.maximum(pre, 0.0)
        y, xhat, rstd = _ln_fwd(
            r, g_r[0].astype(jnp.float32)[None, :],
            be_r[0].astype(jnp.float32)[None, :],
        )
        o, keep = _maybe_drop(y, l, st)
        if want_locals:
            locs.append({"xm": xm, "pre": pre, "xhat": xhat, "rstd": rstd,
                         "keep": keep})
        xcur = o.astype(dtype)
    return xcur, locs


def _dp_fwd_kernel(seed_ref, x_ref, mask_ref, w1_ref, b1_ref, g1_ref,
                   be1_ref, w2_ref, b2_ref, g2_ref, be2_ref, out_ref, *, st):
    st = dict(st, seed=seed_ref[0] + pl.program_id(0))
    refs = (w1_ref, b1_ref, g1_ref, be1_ref, w2_ref, b2_ref, g2_ref, be2_ref)
    out, _ = _dp_fwd_math(x_ref[0], mask_ref[0], refs, st)
    out_ref[0] = out


def _dp_bwd_kernel(seed_ref, x_ref, mask_ref, w1_ref, b1_ref, g1_ref,
                   be1_ref, w2_ref, b2_ref, g2_ref, be2_ref, dout_ref,
                   dx_ref, dw1_ref, db1_ref, dg1_ref, dbe1_ref, dw2_ref,
                   db2_ref, dg2_ref, dbe2_ref, *, st):
    t, c = x_ref.shape[1], x_ref.shape[2]
    dtype = x_ref.dtype
    mask = mask_ref[0]
    maskf = mask.astype(jnp.float32)
    st = dict(st, seed=seed_ref[0] + pl.program_id(0))
    refs = (w1_ref, b1_ref, g1_ref, be1_ref, w2_ref, b2_ref, g2_ref, be2_ref)

    @pl.when(pl.program_id(0) == 0)
    def _zero_accs():
        for ref in (dw1_ref, db1_ref, dg1_ref, dbe1_ref, dw2_ref, db2_ref,
                    dg2_ref, dbe2_ref):
            ref[...] = jnp.zeros_like(ref)

    _, locs = _dp_fwd_math(x_ref[0], mask, refs, st, want_locals=True)

    f = w1_ref.shape[1]
    dcur = dout_ref[0].astype(jnp.float32)
    for l, (w_r, g_r, dw_r, db_r, dg_r, dbe_r, cin) in reversed(list(
        enumerate((
            (w1_ref, g1_ref, dw1_ref, db1_ref, dg1_ref, dbe1_ref, c),
            (w2_ref, g2_ref, dw2_ref, db2_ref, dg2_ref, dbe2_ref, f),
        ))
    )):
        loc = locs[l]
        dy = dcur
        if loc["keep"] is not None:
            dy = dy * loc["keep"] * np.float32(st["drop_scale"])
        dr, dga, dbe = _ln_bwd(
            dy, loc["xhat"], loc["rstd"],
            g_r[0].astype(jnp.float32)[None, :],
        )
        dg_r[0] += dga
        dbe_r[0] += dbe
        dpre = jnp.where(loc["pre"] > 0.0, dr, 0.0)
        cols = _im2col(loc["xm"], st["offs"], t)
        dcur = _conv_bwd(dpre, cols, w_r, dw_r, db_r, maskf, st["offs"],
                         t, cin, dtype)

    dx_ref[0] = dcur.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call plumbing + custom VJPs
# ---------------------------------------------------------------------------


class _TextKey(typing.NamedTuple):
    st: tuple
    interpret: bool


def _st_from_key(key: "_TextKey") -> dict:
    n_layers, offs, thr, scale = key.st
    return {
        "n_layers": n_layers,
        "offs": offs,
        "drop_threshold": thr,
        "drop_scale": scale,
        "n_sites": n_layers,
    }


def _prenet_call(weights, x, mask, seed_f, *, st, interpret,
                 with_grad=False, dout=None):
    from .shardwrap import shard_per_sample

    L = st["n_layers"]
    K = len(st["offs"])

    def impl(seed_f, x, mask, *rest):
        b, t, h = x.shape
        const, per_b = _specs()
        w_specs = [
            const((L, K * h, h)), const((L, h)),    # conv w, b
            const((L, h)), const((L, h)),           # ln gamma, beta
            const((h, h)), const((1, h)),           # proj w, b
        ]
        in_specs = [per_b((1, t, h)), per_b((1, t, 1))] + w_specs
        args = [x, mask, *rest[:6]]

        if not with_grad:
            return pl.pallas_call(
                functools.partial(_prenet_fwd_kernel, st=st),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(b,),
                    in_specs=in_specs,
                    out_specs=per_b((1, t, h)),
                ),
                out_shape=jax.ShapeDtypeStruct((b, t, h), x.dtype),
                interpret=interpret,
            )(seed_f, *args)

        out_shapes = (
            jax.ShapeDtypeStruct((b, t, h), x.dtype),
            jax.ShapeDtypeStruct((L, K * h, h), jnp.float32),
            jax.ShapeDtypeStruct((L, h), jnp.float32),
            jax.ShapeDtypeStruct((L, h), jnp.float32),
            jax.ShapeDtypeStruct((L, h), jnp.float32),
            jax.ShapeDtypeStruct((h, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
        )
        out_specs = (
            per_b((1, t, h)),
            const((L, K * h, h)), const((L, h)),
            const((L, h)), const((L, h)),
            const((h, h)), const((1, h)),
        )
        return pl.pallas_call(
            functools.partial(_prenet_bwd_kernel, st=st),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b,),
                in_specs=in_specs + [per_b((1, t, h))],
                out_specs=out_specs,
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(seed_f, *args, rest[6])

    call_args = (seed_f, x, mask, *weights)
    in_dims = [None, 0, 0] + [None] * 6
    if not with_grad:
        out_dims = 0
    else:
        call_args += (dout,)
        in_dims.append(0)
        out_dims = (0,) + (None,) * 6
    return shard_per_sample(
        impl, call_args, b=x.shape[0], in_dims=in_dims, out_dims=out_dims,
        seed_arg=0,
    )


def _dp_call(weights, x, mask, seed_f, *, st, interpret,
             with_grad=False, dout=None):
    from .shardwrap import shard_per_sample

    K = len(st["offs"])

    def impl(seed_f, x, mask, *rest):
        b, t, c = x.shape
        f = rest[0].shape[1]
        const, per_b = _specs()
        w_specs = [
            const((K * c, f)), const((1, f)),   # conv_1 w, b
            const((1, f)), const((1, f)),       # norm_1 gamma, beta
            const((K * f, f)), const((1, f)),   # conv_2 w, b
            const((1, f)), const((1, f)),       # norm_2 gamma, beta
        ]
        in_specs = [per_b((1, t, c)), per_b((1, t, 1))] + w_specs
        args = [x, mask, *rest[:8]]

        if not with_grad:
            return pl.pallas_call(
                functools.partial(_dp_fwd_kernel, st=st),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(b,),
                    in_specs=in_specs,
                    out_specs=per_b((1, t, f)),
                ),
                out_shape=jax.ShapeDtypeStruct((b, t, f), x.dtype),
                interpret=interpret,
            )(seed_f, *args)

        out_shapes = (
            jax.ShapeDtypeStruct((b, t, c), x.dtype),
            jax.ShapeDtypeStruct((K * c, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((K * f, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
        )
        out_specs = (
            per_b((1, t, c)),
            const((K * c, f)), const((1, f)),
            const((1, f)), const((1, f)),
            const((K * f, f)), const((1, f)),
            const((1, f)), const((1, f)),
        )
        return pl.pallas_call(
            functools.partial(_dp_bwd_kernel, st=st),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b,),
                in_specs=in_specs + [per_b((1, t, f))],
                out_specs=out_specs,
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(seed_f, *args, rest[8])

    call_args = (seed_f, x, mask, *weights)
    in_dims = [None, 0, 0] + [None] * 8
    if not with_grad:
        out_dims = 0
    else:
        call_args += (dout,)
        in_dims.append(0)
        out_dims = (0,) + (None,) * 8
    return shard_per_sample(
        impl, call_args, b=x.shape[0], in_dims=in_dims, out_dims=out_dims,
        seed_arg=0,
    )


def _make_stack_fn(key: "_TextKey", call):
    interpret = key.interpret
    st = dict(_st_from_key(key), interpret=interpret)

    @jax.custom_vjp
    def fn(weights, x, mask, seed_f):
        return call(weights, x, mask, seed_f, st=st, interpret=interpret)

    def fn_fwd(weights, x, mask, seed_f):
        return fn(weights, x, mask, seed_f), (weights, x, mask, seed_f)

    def fn_bwd(res, dout):
        weights, x, mask, seed_f = res
        grads = call(weights, x, mask, seed_f, st=st, interpret=interpret,
                     with_grad=True, dout=dout)
        dweights = tuple(
            g.astype(w.dtype) for g, w in zip(grads[1:], weights)
        )
        return (dweights, grads[0], jnp.zeros_like(mask),
                np.zeros((1,), dtype=jax.dtypes.float0))

    fn.defvjp(fn_fwd, fn_bwd)
    return fn


@functools.lru_cache(maxsize=None)
def _make_prenet_fn(key: "_TextKey"):
    return _make_stack_fn(key, _prenet_call)


@functools.lru_cache(maxsize=None)
def _make_dp_fn(key: "_TextKey"):
    return _make_stack_fn(key, _dp_call)


def _seed_and_st(n_layers, kernel_size, p_dropout, rng, deterministic):
    drop = (not deterministic) and p_dropout > 0.0 and rng is not None
    if drop:
        seed = jax.random.randint(
            rng, (), minval=0, maxval=np.int32(2 ** 31 - 1), dtype=jnp.int32
        )
    else:
        seed = jnp.zeros((), jnp.int32)
    seed_f = jnp.asarray(seed, jnp.int32).reshape((1,))
    st = (
        int(n_layers),
        _offsets(kernel_size, 1),
        (
            np.uint32(min(round(p_dropout * 2 ** 32), 2 ** 32 - 1))
            if drop
            else None
        ),
        (1.0 / (1.0 - p_dropout)) if drop else 1.0,
    )
    return seed_f, st


def prenet_weights(params: Params, dtype) -> tuple:
    """Prenet params → flat kernel-weight tuple (reshapes/casts only;
    autodiff maps cotangents straight back).  Order matches
    ``_prenet_fwd_math``'s refs."""
    layers = params["layers"]
    L, K, h = layers["conv"]["w"].shape[:3]
    return (
        layers["conv"]["w"].reshape(L, K * h, -1).astype(dtype),
        layers["conv"]["b"].astype(jnp.float32),
        layers["norm"]["gamma"].astype(jnp.float32),
        layers["norm"]["beta"].astype(jnp.float32),
        params["proj"]["w"][0].astype(dtype),
        params["proj"]["b"].astype(jnp.float32).reshape(1, -1),
    )


def dp_weights(params: Params, dtype) -> tuple:
    """Duration-predictor params → flat kernel-weight tuple (order matches
    ``_dp_fwd_math``'s refs; the 1-channel proj stays with the caller)."""
    K, c = params["conv_1"]["w"].shape[:2]
    return (
        params["conv_1"]["w"].reshape(K * c, -1).astype(dtype),
        params["conv_1"]["b"].astype(jnp.float32).reshape(1, -1),
        params["norm_1"]["gamma"].astype(jnp.float32).reshape(1, -1),
        params["norm_1"]["beta"].astype(jnp.float32).reshape(1, -1),
        params["conv_2"]["w"].reshape(
            K * params["conv_2"]["w"].shape[1], -1
        ).astype(dtype),
        params["conv_2"]["b"].astype(jnp.float32).reshape(1, -1),
        params["norm_2"]["gamma"].astype(jnp.float32).reshape(1, -1),
        params["norm_2"]["beta"].astype(jnp.float32).reshape(1, -1),
    )


def prenet_fused(
    params: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    p_dropout: float = 0.5,
    rng: typing.Optional[jax.Array] = None,
    deterministic: bool = True,
    interpret: typing.Optional[bool] = None,
) -> jnp.ndarray:
    """ConvReluNorm prenet as one fused kernel (layers.py:54-80 semantics;
    drop-in for attention.prenet_apply)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, h = x.shape
    L, K = params["layers"]["conv"]["w"].shape[:2]
    dtype = x.dtype
    weights = prenet_weights(params, dtype)
    seed_f, st = _seed_and_st(L, K, p_dropout, rng, deterministic)
    fn = _make_prenet_fn(_TextKey(st, interpret))
    mask = jnp.broadcast_to(x_mask.astype(dtype), (b, t, 1))
    return fn(weights, x, mask, seed_f)


def duration_predictor_fused(
    params: Params,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    *,
    p_dropout: float,
    rng: typing.Optional[jax.Array] = None,
    deterministic: bool = True,
    interpret: typing.Optional[bool] = None,
) -> jnp.ndarray:
    """Duration-predictor conv stack as one fused kernel + the final
    1-channel projection outside (models.py:41-51 semantics; drop-in for
    models.duration_predictor_apply)."""
    from .conv import conv1d

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, c = x.shape
    K = params["conv_1"]["w"].shape[0]
    dtype = x.dtype
    weights = dp_weights(params, dtype)
    seed_f, st = _seed_and_st(2, K, p_dropout, rng, deterministic)
    fn = _make_dp_fn(_TextKey(st, interpret))
    mask = jnp.broadcast_to(x_mask.astype(dtype), (b, t, 1))
    h2 = fn(weights, x, mask, seed_f)
    return conv1d(h2 * x_mask, params["proj"]) * x_mask
