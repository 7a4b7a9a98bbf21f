"""Fused Pallas kernel for the WN (WaveNet-style) gated conv stack.

Why: the roofline model (utils/roofline.py, BASELINE.md round 3) shows the
train step is HBM-bound — the flow decoder's WN stacks account for ~89% of
the step's HBM bytes, and each WN layer crosses five XLA op boundaries
(k-wide conv → dropout → gated tanh·sigmoid → 1x1 conv → residual/skip
split), materializing ~14 h-sized HBM passes per layer.  This kernel runs
the ENTIRE n_layers stack for one sample in VMEM: HBM traffic collapses to
read x + write skip (+ weights), ~4 h-sized passes per stack.

Semantics are wn_apply's exactly (reference layers.py:83-170, WN.forward
:138-162): per layer
    x_in = drop(dilated_conv_k(x))              # bias inside the conv
    acts = tanh((x_in+g)[:h]) * sigmoid((x_in+g)[h:])
    rs   = conv_1x1(acts)
    x    = (x + rs[:h]) * mask;  skip += rs[h:]   (last layer: skip += rs)
and the caller applies the final ``* x_mask``.  The last layer's h-wide
res_skip conv is zero-padded to 2h on the res half so the loop body is
uniform (the padded half contributes nothing to any gradient).

The convolution is im2col (K time-shifted copies concatenated on the
channel axis) followed by one [t, K·h] x [K·h, 2h] MXU matmul — the same
K-deep contraction XLA's conv lowering uses.

Backward is a second Pallas kernel (custom VJP): it recomputes the forward
layer inputs in VMEM (storing only the L layer inputs — [t, h] each), then
walks the layers in reverse producing dx, dW, db, dg with weight-gradient
accumulators resident in VMEM across the batch grid.  Dropout masks are
regenerated bit-identically via the TPU PRNG seeded per (sample, layer).

Weight-norm folding (g·v/||v||) happens OUTSIDE the kernel in plain JAX, so
its gradient is handled by autodiff and the kernel sees direct weights.

Note on dropout RNG: the Pallas path draws its masks from the TPU hardware
PRNG, a DIFFERENT stream than the XLA path's jax.random bits — training
statistics are identical, exact values are not; equivalence tests compare
with dropout off.
"""

import contextlib
import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = typing.Dict[str, typing.Any]


_PORTABLE_OPS = [False]


@contextlib.contextmanager
def portable_ops():
    """Run the kernels' *_fwd_math functions OUTSIDE Pallas (they are pure
    jnp except for pltpu.roll): swaps _shifted onto jnp.roll.  Used by the
    autodiff-oracle tests that jax.grad the forward math directly to
    verify the hand-written VJPs (incl. their dropout branches)."""
    _PORTABLE_OPS[0] = True
    try:
        yield
    finally:
        _PORTABLE_OPS[0] = False


def _shifted(
    arr: jnp.ndarray, off: int, t: int, pack: int = 1
) -> jnp.ndarray:
    """out[s] = arr[s + off] with zeros outside [0, t) (conv 'same' pad).

    Mosaic's sublane rotate only supports 32-bit element types, and its
    concatenate refuses sublane-misaligned pieces — so bf16 data round-trips
    through f32 for the roll (two VPU casts, negligible next to the MXU
    work) and circular wrap is zeroed with an iota mask.

    ``pack`` > 1 treats the row axis as ``pack`` independent length-``t``
    segments (sample-packed kernels): the roll crosses segment boundaries,
    and the iota mask — built on the row-within-segment index — zeroes
    exactly the rows whose rolled-in value came from a neighboring segment
    (the rows a 'same' conv pads with zeros anyway)."""
    if off == 0:
        return arr
    rows_total = t * pack
    dtype = arr.dtype
    work = arr if arr.dtype.itemsize == 4 else arr.astype(jnp.float32)
    if _PORTABLE_OPS[0]:
        rolled = jnp.roll(work, (-off) % rows_total, axis=0)
    else:
        rolled = pltpu.roll(work, shift=(-off) % rows_total, axis=0)
    if pack == 1:
        rows = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 0)
    else:
        # row-within-segment index: 3-D iota over (pack, t, ...) reshaped
        # back — a pure-layout reshape (row-major), no modulo op needed
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (pack, t) + arr.shape[1:], 1
        ).reshape(arr.shape)
    if off > 0:
        out = jnp.where(rows < t - off, rolled, jnp.zeros_like(rolled))
    else:
        out = jnp.where(rows >= -off, rolled, jnp.zeros_like(rolled))
    return out.astype(dtype)


def _im2col(x: jnp.ndarray, offsets, t: int, pack: int = 1) -> jnp.ndarray:
    """[t, h] -> [t, K*h], tap-major column blocks (matches W reshape).
    ``pack``: rows are ``pack`` independent length-``t`` segments."""
    return jnp.concatenate(
        [_shifted(x, off, t, pack) for off in offsets], axis=1
    )


def _offsets(kernel_size: int, dilation: int):
    return tuple(dilation * (k - kernel_size // 2) for k in range(kernel_size))


def _portable_bits(seed, shape):
    """Counter-based uint32 bits for interpret mode (pltpu.prng_* has no
    interpret-mode lowering): xorshift-multiply hash of (seed, flat index).
    A different stream than the TPU hardware PRNG with the same keep
    statistics and the same deterministic-replay property — which is all
    in-kernel dropout needs.  Lets the dropout branches of every kernel
    backward run (and be gradient-checked) off-TPU."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = rows * np.uint32(shape[1]) + cols
    x = x ^ (seed.astype(jnp.uint32) * np.uint32(2654435761))
    x = (x ^ (x >> 13)) * np.uint32(0x9E3779B1)
    x = (x ^ (x >> 15)) * np.uint32(0x85EBCA6B)
    return x ^ (x >> 16)


def _keep_bits(seed, shape, st):
    """uint32 bits for a dropout site: hardware PRNG on TPU, portable hash
    in interpret mode."""
    if st.get("interpret"):
        return _portable_bits(seed, shape)
    pltpu.prng_seed(seed)
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)


def _regen_keep(l, shape, st):
    """Regenerate layer ``l``'s dropout keep mask (f32 0/1) bit-identically:
    the forward seeds the PRNG per (sample, layer) and draws once, so any
    pass can replay the same mask independently."""
    seed = st["seed"] * np.int32(st["n_layers"]) + np.int32(l)
    bits = _keep_bits(seed, shape, st)
    # f32 0/1 mask, not an i1 vector — Mosaic rejects some bool-vector
    # stores/relayouts (same workaround as mas_pallas)
    return jnp.where(bits >= st["drop_threshold"], 1.0, 0.0)


def _layer_fwd(xcur, l, refs, st):
    """Shared forward math for one WN layer.

    Returns ``(x_next, skip_inc, (th, sg, keepf))`` — the gate activations
    (f32) and dropout keep mask (f32 0/1, or None) so callers can stash
    them for a backward walk that skips recomputing the conv + gate."""
    (win_ref, bin_ref, wrs_ref, brs_ref, g_ref, mask) = refs
    t, h = xcur.shape
    dtype = xcur.dtype
    cols = _im2col(xcur, st["offs"][l], t)
    # gated math stays f32: the matmul accumulates f32 anyway, and Mosaic
    # rejects bf16 transcendentals' internal f32-constant broadcasts
    xin = (
        jnp.dot(cols, win_ref[l], preferred_element_type=jnp.float32)
        + bin_ref[l].astype(jnp.float32)[None, :]
    )
    keepf = None
    if st["drop_threshold"] is not None:
        keepf = _regen_keep(l, xin.shape, st)
        xin = xin * keepf * np.float32(st["drop_scale"])
    in_act = xin + g_ref[0, l].astype(jnp.float32)[None, :]
    u, v = in_act[:, :h], in_act[:, h:]
    th, sg = jnp.tanh(u), jax.nn.sigmoid(v)
    acts = (th * sg).astype(dtype)
    rs = (
        jnp.dot(acts, wrs_ref[l], preferred_element_type=jnp.float32)
        + brs_ref[l].astype(jnp.float32)[None, :]
    ).astype(dtype)
    x_next = (xcur + rs[:, :h]) * mask
    return x_next, rs[:, h:], (th, sg, keepf)


def _fwd_kernel(seed_ref, x_ref, mask_ref, win_ref, bin_ref, wrs_ref, brs_ref,
                g_ref, out_ref, *, st):
    t, h = x_ref.shape[1], x_ref.shape[2]
    xcur = x_ref[0]
    mask = mask_ref[0]  # [t, 1]
    skip = jnp.zeros((t, h), jnp.float32)
    st = dict(st, seed=seed_ref[0] + pl.program_id(0))
    refs = (win_ref, bin_ref, wrs_ref, brs_ref, g_ref, mask)
    for l in range(st["n_layers"]):
        xcur, skip_inc, _ = _layer_fwd(xcur, l, refs, st)
        skip = skip + skip_inc.astype(jnp.float32)
    out_ref[0] = skip.astype(out_ref.dtype)


def _fwd_save_kernel(seed_ref, x_ref, mask_ref, win_ref, bin_ref, wrs_ref,
                     brs_ref, g_ref, out_ref, xs_ref, th_ref, sg_ref, *, st):
    """Forward that additionally writes per-layer residuals (layer inputs +
    gate activations) to HBM so the backward kernel can skip its recompute
    pass entirely — the measured winner once the step is MXU-bound
    (BASELINE.md round 3: recompute is 1/3 of the backward kernel's FLOPs,
    while the extra DMA overlaps with the walk's matmuls).  Dropout keep
    masks are NOT stored: backward replays them from the PRNG."""
    t, h = x_ref.shape[1], x_ref.shape[2]
    dtype = x_ref.dtype
    xcur = x_ref[0]
    mask = mask_ref[0]
    skip = jnp.zeros((t, h), jnp.float32)
    st = dict(st, seed=seed_ref[0] + pl.program_id(0))
    refs = (win_ref, bin_ref, wrs_ref, brs_ref, g_ref, mask)
    for l in range(st["n_layers"]):
        xs_ref[0, l] = xcur
        xcur, skip_inc, (th, sg, _) = _layer_fwd(xcur, l, refs, st)
        th_ref[0, l] = th.astype(dtype)
        sg_ref[0, l] = sg.astype(dtype)
        skip = skip + skip_inc.astype(jnp.float32)
    out_ref[0] = skip.astype(out_ref.dtype)


def _reverse_walk(load, mask, dout, win_ref, wrs_ref,
                  dwin_ref, dbin_ref, dwrs_ref, dbrs_ref, dg_ref,
                  *, st, t, h, dtype):
    """The 4-matmul-per-layer reverse walk (da, dW_rs, d_cols, dW_in),
    shared by all backward kernels.  ``load(l)`` returns that layer's
    ``(x_l, th, sg, keepf)`` — from VMEM scratch (recompute mode) or from
    HBM-stored residuals (store mode).  Returns the stack-input cotangent
    g_x [t, h] (f32)."""
    g_skip = dout.astype(jnp.float32)  # [t, h], same for every layer
    g_x = jnp.zeros((t, h), jnp.float32)
    for l in range(st["n_layers"] - 1, -1, -1):
        x_l, th, sg, keepf = load(l)
        acts = (th * sg).astype(dtype)
        # rs cotangent: res half feeds x_{l+1} = (x_l + rs[:h]) * mask,
        # skip half feeds the output sum (padded last layer: res-half
        # weights are zero so its g_rs[:h] contributes nothing)
        g_rs = jnp.concatenate([g_x * mask.astype(jnp.float32), g_skip], axis=1)
        da = jnp.dot(
            g_rs.astype(dtype), wrs_ref[l].T, preferred_element_type=jnp.float32
        )
        dwrs_ref[l] += jnp.dot(
            acts.T, g_rs.astype(dtype), preferred_element_type=jnp.float32
        )
        dbrs_ref[l] += jnp.sum(g_rs, axis=0)
        # gated activation: acts = tanh(u) * sigmoid(v)
        du = da * sg * (1.0 - th * th)
        dv = da * th * sg * (1.0 - sg)
        d_in_act = jnp.concatenate([du, dv], axis=1)  # [t, 2h] f32
        dg_ref[0, l] = jnp.sum(d_in_act, axis=0).astype(dg_ref.dtype)
        d_xin = d_in_act
        if st["drop_threshold"] is not None:
            d_xin = d_xin * keepf * np.float32(st["drop_scale"])
        cols = _im2col(x_l, st["offs"][l], t)
        dwin_ref[l] += jnp.dot(
            cols.T, d_xin.astype(dtype), preferred_element_type=jnp.float32
        )
        dbin_ref[l] += jnp.sum(d_xin, axis=0)
        # conv transpose: fwd gathered x[s+off], so cotangent scatters back
        d_cols = jnp.dot(
            d_xin.astype(dtype), win_ref[l].T, preferred_element_type=jnp.float32
        )  # [t, K*h]
        dx_conv = jnp.zeros((t, h), jnp.float32)
        for k, off in enumerate(st["offs"][l]):
            dx_conv = dx_conv + _shifted(
                d_cols[:, k * h : (k + 1) * h], -off, t
            )
        g_x = g_x * mask.astype(jnp.float32) + dx_conv
    return g_x


def _zero_weight_accs(dwin_ref, dbin_ref, dwrs_ref, dbrs_ref):
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dwin_ref[...] = jnp.zeros_like(dwin_ref)
        dbin_ref[...] = jnp.zeros_like(dbin_ref)
        dwrs_ref[...] = jnp.zeros_like(dwrs_ref)
        dbrs_ref[...] = jnp.zeros_like(dbrs_ref)


def _bwd_kernel(seed_ref, x_ref, mask_ref, win_ref, bin_ref, wrs_ref, brs_ref,
                g_ref, dout_ref,
                dx_ref, dwin_ref, dbin_ref, dwrs_ref, dbrs_ref, dg_ref,
                xs_ref, th_ref, sg_ref, keep_ref, *, st):
    t, h = x_ref.shape[1], x_ref.shape[2]
    L = st["n_layers"]
    dtype = x_ref.dtype
    mask = mask_ref[0]
    st = dict(st, seed=seed_ref[0] + pl.program_id(0))
    refs = (win_ref, bin_ref, wrs_ref, brs_ref, g_ref, mask)
    _zero_weight_accs(dwin_ref, dbin_ref, dwrs_ref, dbrs_ref)

    # ---- forward recompute: store layer inputs + gate activations (+keep)
    # so the reverse walk never re-runs the conv or the gate (profile: the
    # walk's recompute was ~40% of the backward kernel's time)
    xcur = x_ref[0]
    for l in range(L):
        xs_ref[l] = xcur
        xcur, _, (th, sg, keepf) = _layer_fwd(xcur, l, refs, st)
        th_ref[l] = th.astype(dtype)
        sg_ref[l] = sg.astype(dtype)
        if keepf is not None:
            keep_ref[l] = keepf.astype(dtype)

    def load(l):
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

    g_x = _reverse_walk(
        load, mask, dout_ref[0], win_ref, wrs_ref,
        dwin_ref, dbin_ref, dwrs_ref, dbrs_ref, dg_ref,
        st=st, t=t, h=h, dtype=dtype,
    )
    dx_ref[0] = g_x.astype(dx_ref.dtype)


def _bwd_store_kernel(seed_ref, mask_ref, win_ref, wrs_ref,
                      xs_ref, th_ref, sg_ref, dout_ref,
                      dx_ref, dwin_ref, dbin_ref, dwrs_ref, dbrs_ref, dg_ref,
                      *, st):
    """Backward from forward-saved residuals: no recompute pass at all.
    Dropout keep masks are replayed from the PRNG per layer."""
    t, h = xs_ref.shape[2], xs_ref.shape[3]
    dtype = xs_ref.dtype
    mask = mask_ref[0]
    st = dict(st, seed=seed_ref[0] + pl.program_id(0))
    _zero_weight_accs(dwin_ref, dbin_ref, dwrs_ref, dbrs_ref)

    def load(l):
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

    g_x = _reverse_walk(
        load, mask, dout_ref[0], win_ref, wrs_ref,
        dwin_ref, dbin_ref, dwrs_ref, dbrs_ref, dg_ref,
        st=st, t=t, h=h, dtype=dtype,
    )
    dx_ref[0] = g_x.astype(dx_ref.dtype)


def _specs():
    """BlockSpec builders: const = resident across the batch grid (weights,
    accumulators); per_b = one sample per grid step."""
    # index maps receive (grid index, *scalar-prefetch refs)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    per_b = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, *_: (i,) + tuple(0 for _ in shape[1:]),
        memory_space=pltpu.VMEM,
    )
    return const, per_b


def _grad_out_shapes(b, t, h, L, Kh, dtype):
    shapes = (
        jax.ShapeDtypeStruct((b, t, h), dtype),            # dx
        jax.ShapeDtypeStruct((L, Kh, 2 * h), jnp.float32),  # dW_in
        jax.ShapeDtypeStruct((L, 2 * h), jnp.float32),      # db_in
        jax.ShapeDtypeStruct((L, h, 2 * h), jnp.float32),   # dW_rs
        jax.ShapeDtypeStruct((L, 2 * h), jnp.float32),      # db_rs
        jax.ShapeDtypeStruct((b, L, 2 * h), jnp.float32),   # dg
    )
    const, per_b = _specs()
    specs = (
        per_b((1, t, h)),
        const((L, Kh, 2 * h)),
        const((L, 2 * h)),
        const((L, h, 2 * h)),
        const((L, 2 * h)),
        per_b((1, L, 2 * h)),
    )
    return shapes, specs


def _wn_pallas_call(
    W_in, b_in, W_rs, b_rs, x, x_mask, g_all, seed_f,
    *, st, interpret, mode="fwd", dout=None
):
    """``mode``: "fwd" (plain forward), "fwd_save" (forward + HBM residuals),
    "bwd" (recompute-in-kernel backward).  Residual-store backward has its
    own entry point, ``_wn_bwd_store_call``.

    Under a multi-device mesh the call runs inside a batch-splitting
    shard_map (ops/shardwrap.py) — ``impl`` derives every shape from its
    (local) operands."""
    from .shardwrap import shard_per_sample

    L = st["n_layers"]

    def impl(seed_f, x, x_mask, W_in, b_in, W_rs, b_rs, g_all, *rest):
        b, t, h = x.shape
        const, per_b = _specs()
        Kh = W_in.shape[1]
        in_specs = [
            per_b((1, t, h)),        # x
            per_b((1, t, 1)),        # mask
            const((L, Kh, 2 * h)),   # W_in
            const((L, 2 * h)),       # b_in
            const((L, h, 2 * h)),    # W_rs
            const((L, 2 * h)),       # b_rs
            per_b((1, L, 2 * h)),    # g
        ]
        args = [x, x_mask, W_in, b_in, W_rs, b_rs, g_all]

        if mode == "fwd":
            kernel = functools.partial(_fwd_kernel, st=st)
            return pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(b,),
                    in_specs=in_specs,
                    out_specs=per_b((1, t, h)),
                ),
                out_shape=jax.ShapeDtypeStruct((b, t, h), x.dtype),
                interpret=interpret,
            )(seed_f, *args)

        if mode == "fwd_save":
            kernel = functools.partial(_fwd_save_kernel, st=st)
            res = per_b((1, L, t, h))
            return pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(b,),
                    in_specs=in_specs,
                    out_specs=(per_b((1, t, h)), res, res, res),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((b, t, h), x.dtype),
                    jax.ShapeDtypeStruct((b, L, t, h), x.dtype),  # xs
                    jax.ShapeDtypeStruct((b, L, t, h), x.dtype),  # tanh
                    jax.ShapeDtypeStruct((b, L, t, h), x.dtype),  # sigmoid
                ),
                interpret=interpret,
            )(seed_f, *args)

        assert mode == "bwd", mode
        kernel = functools.partial(_bwd_kernel, st=st)
        out_shapes, out_specs = _grad_out_shapes(b, t, h, L, Kh, x.dtype)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b,),
                in_specs=in_specs + [per_b((1, t, h))],  # + dout
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
        )(seed_f, *args, rest[0])

    call_args = (seed_f, x, x_mask, W_in, b_in, W_rs, b_rs, g_all)
    in_dims = [None, 0, 0, None, None, None, None, 0]
    if mode == "fwd":
        out_dims = 0
    elif mode == "fwd_save":
        out_dims = (0, 0, 0, 0)
    else:
        call_args += (dout,)
        in_dims.append(0)
        # dx, dW_in, db_in, dW_rs, db_rs, dg
        out_dims = (0, None, None, None, None, 0)
    return shard_per_sample(
        impl, call_args, b=x.shape[0], in_dims=in_dims, out_dims=out_dims,
        seed_arg=0,
    )


def _wn_bwd_store_call(
    W_in, W_rs, x_mask, xs, th, sg, dout, seed_f, *, st, interpret
):
    """Backward pallas_call for residual-store mode."""
    from .shardwrap import shard_per_sample

    def impl(seed_f, x_mask, W_in, W_rs, xs, th, sg, dout):
        b, L, t, h = xs.shape
        Kh = W_in.shape[1]
        const, per_b = _specs()
        res = per_b((1, L, t, h))
        in_specs = [
            per_b((1, t, 1)),        # mask
            const((L, Kh, 2 * h)),   # W_in
            const((L, h, 2 * h)),    # W_rs
            res, res, res,           # xs, th, sg
            per_b((1, t, h)),        # dout
        ]
        out_shapes, out_specs = _grad_out_shapes(b, t, h, L, Kh, xs.dtype)
        kernel = functools.partial(_bwd_store_kernel, st=st)
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
        )(seed_f, x_mask, W_in, W_rs, xs, th, sg, dout)

    return shard_per_sample(
        impl,
        (seed_f, x_mask, W_in, W_rs, xs, th, sg, dout),
        b=xs.shape[0],
        in_dims=[None, 0, None, None, 0, 0, 0, 0],
        out_dims=(0, None, None, None, None, 0),
        seed_arg=0,
    )


def wn_stack_fused(
    W_in, b_in, W_rs, b_rs, x, x_mask, g_all, seed,
    *, kernel_size, dilation_rate, n_layers, p_dropout, deterministic,
    interpret=None, residuals="recompute",
):
    """Differentiable fused WN stack.  Direct (folded) weights:

    W_in [L, K*h, 2h] (tap-major rows), b_in [L, 2h], W_rs [L, h, 2h]
    (last layer res-half zero), b_rs [L, 2h]; x [b, t, h]; x_mask [b, t, 1];
    g_all [b, L, 2h] (zeros when unconditioned); seed int32 scalar.
    Returns skip [b, t, h] (caller applies the final mask).

    ``residuals``: "recompute" — backward re-runs the forward in-kernel
    (stores nothing across fwd/bwd; minimal HBM, 3x-forward FLOPs);
    "store" — forward writes per-layer inputs + gate activations to HBM
    (3·L·t·h per sample) and backward skips the recompute pass (2x-forward
    FLOPs).  "store" is the measured winner once the step is MXU-bound
    (v5e, BASELINE.md round 3); "recompute" when HBM capacity/traffic is
    the constraint.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert residuals in ("recompute", "store"), residuals
    drop = (not deterministic) and p_dropout > 0.0
    st = {
        "n_layers": n_layers,
        "offs": tuple(
            _offsets(kernel_size, dilation_rate ** l) for l in range(n_layers)
        ),
        "drop_threshold": (
            np.uint32(min(round(p_dropout * 2 ** 32), 2 ** 32 - 1)) if drop else None
        ),
        "drop_scale": (1.0 / (1.0 - p_dropout)) if drop else 1.0,
    }
    seed_f = jnp.asarray(seed, jnp.int32).reshape((1,))
    f = _make_fused_fn(_StaticKey(st_tuple(st), interpret, residuals))
    return f(W_in, b_in, W_rs, b_rs, x, x_mask, g_all, seed_f)


def st_tuple(st: dict) -> tuple:
    return (
        st["n_layers"],
        st["offs"],
        st["drop_threshold"],
        st["drop_scale"],
    )


class _StaticKey(typing.NamedTuple):
    st: tuple
    interpret: bool
    residuals: str = "recompute"

    def as_dict(self) -> dict:
        n_layers, offs, thr, scale = self.st
        return {
            "n_layers": n_layers,
            "offs": offs,
            "drop_threshold": thr,
            "drop_scale": scale,
        }


@functools.lru_cache(maxsize=None)
def _make_fused_fn(key: "_StaticKey"):
    """custom_vjp function per static config.  The dropout seed is a real
    ARGUMENT (int32, float0 cotangent), not a closure capture — closing
    over a traced value inside custom_vjp breaks under remat/scan."""
    interpret = key.interpret
    st = dict(key.as_dict(), interpret=interpret)
    store = key.residuals == "store"

    @jax.custom_vjp
    def f(W_in, b_in, W_rs, b_rs, x, x_mask, g_all, seed_f):
        return _wn_pallas_call(
            W_in, b_in, W_rs, b_rs, x, x_mask, g_all, seed_f,
            st=st, interpret=interpret,
        )

    def f_fwd(W_in, b_in, W_rs, b_rs, x, x_mask, g_all, seed_f):
        if store:
            out, xs, th, sg = _wn_pallas_call(
                W_in, b_in, W_rs, b_rs, x, x_mask, g_all, seed_f,
                st=st, interpret=interpret, mode="fwd_save",
            )
            # zero-length dtype carriers: custom_vjp residuals must be JAX
            # types, and backward needs the cotangent dtypes of the unsaved
            # primals (b_in, b_rs, g_all)
            dtypes = tuple(
                jnp.zeros((0,), a.dtype) for a in (b_in, b_rs, g_all)
            )
            return out, (W_in, W_rs, x_mask, seed_f, xs, th, sg, dtypes)
        out = f(W_in, b_in, W_rs, b_rs, x, x_mask, g_all, seed_f)
        return out, (W_in, b_in, W_rs, b_rs, x, x_mask, g_all, seed_f)

    def f_bwd(res, dout):
        if store:
            W_in, W_rs, x_mask, seed_f, xs, th, sg, dtypes = res
            din_t, drs_t = W_in.dtype, W_rs.dtype
            bin_t, brs_t, dg_t = (a.dtype for a in dtypes)
            dx, dwin, dbin, dwrs, dbrs, dg = _wn_bwd_store_call(
                W_in, W_rs, x_mask, xs, th, sg, dout, seed_f,
                st=st, interpret=interpret,
            )
        else:
            W_in, b_in, W_rs, b_rs, x, x_mask, g_all, seed_f = res
            din_t, bin_t = W_in.dtype, b_in.dtype
            drs_t, brs_t, dg_t = W_rs.dtype, b_rs.dtype, g_all.dtype
            dx, dwin, dbin, dwrs, dbrs, dg = _wn_pallas_call(
                W_in, b_in, W_rs, b_rs, x, x_mask, g_all, seed_f,
                st=st, interpret=interpret, mode="bwd", dout=dout,
            )
        return (
            dwin.astype(din_t),
            dbin.astype(bin_t),
            dwrs.astype(drs_t),
            dbrs.astype(brs_t),
            dx,
            jnp.zeros_like(x_mask),
            dg.astype(dg_t),
            np.zeros((1,), dtype=jax.dtypes.float0),
        )

    f.defvjp(f_fwd, f_bwd)
    return f


def fold_wn_weights(params: Params, n_layers: int, dtype) -> tuple:
    """Stacked WN params (wn_init layout) -> direct kernel weights.

    Weight-norm folds in fp32 via plain JAX (autodiff handles its VJP);
    the last layer's h-wide res_skip conv is padded to 2h on the res half.
    """
    from .conv import weight_norm_effective

    def fold(p):
        if "v" in p:
            return weight_norm_effective(p), p["b"]
        return p["w"], p["b"]

    # fold per layer explicitly (L is tiny and static); weight_norm's
    # reduction axes are fixed to the unstacked [k, c_in, c_out] layout
    in_stack = params["in_layers"]
    L_in = jax.tree_util.tree_leaves(in_stack)[0].shape[0]
    w_list, b_list = [], []
    for l in range(L_in):
        p = jax.tree_util.tree_map(lambda a: a[l], in_stack)
        w, bb = fold(p)
        K, h, h2 = w.shape
        w_list.append(w.reshape(K * h, h2))
        b_list.append(bb)
    W_in = jnp.stack(w_list).astype(dtype)
    b_in = jnp.stack(b_list).astype(jnp.float32)

    rs_list, rb_list = [], []
    if n_layers > 1:
        rs_stack = params["res_skip"]
        for l in range(n_layers - 1):
            p = jax.tree_util.tree_map(lambda a: a[l], rs_stack)
            w, bb = fold(p)
            rs_list.append(w[0])  # [h, 2h]
            rb_list.append(bb)
    w_last, b_last = fold(params["res_skip_last"])
    h = w_last.shape[1]
    rs_list.append(
        jnp.concatenate([jnp.zeros((h, h), w_last.dtype), w_last[0]], axis=1)
    )
    rb_list.append(jnp.concatenate([jnp.zeros((h,), b_last.dtype), b_last]))
    W_rs = jnp.stack(rs_list).astype(dtype)
    b_rs = jnp.stack(rb_list).astype(jnp.float32)
    return W_in, b_in, W_rs, b_rs


def wn_apply_pallas(
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
    residuals: str = "recompute",
) -> jnp.ndarray:
    """Drop-in fused replacement for ops.flows.wn_apply (same signature)."""
    from .conv import conv1d

    if (
        rng is not None
        and not deterministic
        and p_dropout > 0.0
        and jax.default_backend() != "tpu"
    ):
        # interpret mode has no lowering for the TPU PRNG primitives; the
        # XLA path is the same math with a different dropout stream
        from .flows import wn_apply

        return wn_apply(
            params, x, x_mask, g, hidden_channels, dilation_rate, n_layers,
            p_dropout=p_dropout, rng=rng, deterministic=deterministic,
        )

    h = hidden_channels
    b, t, _ = x.shape
    W_in, b_in, W_rs, b_rs = fold_wn_weights(params, n_layers, x.dtype)

    if g is not None:
        g_all = conv1d(g, params["cond"]).astype(x.dtype)  # [b, 1, 2h*L]
        g_all = g_all.reshape(b, n_layers, 2 * h)
    else:
        g_all = jnp.zeros((b, n_layers, 2 * h), x.dtype)

    if rng is not None and not deterministic and p_dropout > 0.0:
        # one int32 seed per call; the kernel folds in (sample, layer)
        seed = jax.random.randint(
            rng, (), minval=0, maxval=np.int32(2 ** 31 - 1), dtype=jnp.int32
        )
        det = False
    else:
        seed = jnp.zeros((), jnp.int32)
        det = True

    mask = jnp.broadcast_to(x_mask.astype(x.dtype), (b, t, 1))
    out = wn_stack_fused(
        W_in, b_in, W_rs, b_rs, x, mask, g_all, seed,
        kernel_size=params_kernel_size(params),
        dilation_rate=dilation_rate,
        n_layers=n_layers,
        p_dropout=p_dropout,
        deterministic=det,
        residuals=residuals,
    )
    return out * x_mask


def params_kernel_size(params: Params) -> int:
    leaf = params["in_layers"]["v" if "v" in params["in_layers"] else "w"]
    return int(leaf.shape[1])  # [L, k, c_in, c_out]
