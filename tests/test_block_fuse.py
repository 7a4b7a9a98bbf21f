"""Whole-flow-block fused Pallas kernel (ops/block_pallas.py) vs op-by-op.

One training-forward flow block — actnorm∘invconv folded into a single
[c, c] affine, coupling start/end 1x1 convs, the WN gated stack, the
affine transform, and the coupling logdet — runs as ONE Pallas kernel.
It must be a drop-in numerical replacement for the
actnorm_fwd → invconv_apply → coupling_apply chain: forward outputs,
total logdet (actnorm/invconv terms computed outside from weights+x_len),
and every parameter gradient (through the differentiable weight fold)
agree to fp32 round-off.  Reference block semantics:
models.py:193-211, layers.py:173-275, attentions.py:77-145.

CPU runs use Pallas interpret mode (same math, XLA-compiled).
"""

import dataclasses

import jax
import jax.flatten_util as fu
import jax.numpy as jnp
import numpy as np
import pytest

from glow_tts_train_tpu.ops import flows

from helpers import fd_directional_grad_check, random_batch, tiny_config

# measured 2026-08-19: interpret-mode Pallas block-kernel sweeps (~4 min on a stock CPU box); `make test` skips, `make test-all` runs
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _fp32_matmuls():
    """TPU lowers f32 dots/convs to single-pass bf16 MXU by default; these
    parity tolerances assume fp32 round-off.  The Mosaic kernels compute
    f32 matmuls at full precision, so at default precision the two paths
    legitimately diverge by ~1e-2 (measured on v5e).  No-op on CPU."""
    with jax.default_matmul_precision("highest"):
        yield


def _decoder_pair(**over):
    base = dict(
        in_channels=80, hidden_channels=64, kernel_size=5, dilation_rate=1,
        n_blocks=3, n_layers=2, n_split=4, n_sqz=2, sigmoid_scale=False,
        gin_channels=0, p_dropout=0.0, unroll=False, remat=False,
        wn_impl="xla", wn_residuals="recompute",
    )
    base.update(over)
    return (
        flows.DecoderHyper(**base, block_fuse=False),
        flows.DecoderHyper(**base, block_fuse=True, block_fuse_reverse=True),
    )


def _inputs(b=2, t=24, c=80, gin=0, seed=1):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    lens = np.linspace(t, max(t - 7, 2), num=b).astype(int)
    mask = jnp.asarray(
        (np.arange(t)[None, :, None] < lens[:, None, None]).astype(np.float32)
    )
    g = (
        jnp.asarray(rng.standard_normal((b, 1, gin)), jnp.float32)
        if gin
        else None
    )
    return x * mask, mask, g


@pytest.mark.parametrize(
    "over",
    [
        {},
        {"sigmoid_scale": True},
        {"gin_channels": 16},
        {"kernel_size": 3, "dilation_rate": 2, "n_layers": 3},
        {"n_split": 8, "n_sqz": 1},
        {"remat": "wn"},
        {"wn_residuals": "store", "unroll": True},
        {"wn_residuals": "store", "unroll": True, "sigmoid_scale": True,
         "gin_channels": 16},
    ],
    ids=["base", "sigmoid", "gin", "k3d2L3", "split8sqz1", "remat_wn",
         "store_unroll", "store_unroll_sig_gin"],
)
def test_fused_block_matches_op_by_op(over):
    hp_ref, hp_fused = _decoder_pair(**over)
    params = flows.decoder_init(jax.random.PRNGKey(0), hp_ref)
    x, mask, g = _inputs(gin=over.get("gin_channels", 0))

    def loss(p, hp):
        z, ld = flows.decoder_fwd(p, x, mask, hp, g=g, deterministic=True)
        return jnp.sum(z**2) + jnp.sum(ld), (z, ld)

    (_, (z1, ld1)), g1 = jax.value_and_grad(loss, has_aux=True)(params, hp_ref)
    (_, (z2, ld2)), g2 = jax.value_and_grad(loss, has_aux=True)(
        params, hp_fused
    )
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1), atol=3e-6)
    np.testing.assert_allclose(np.asarray(ld2), np.asarray(ld1), rtol=1e-6)
    f1, _ = fu.ravel_pytree(g1)
    f2, _ = fu.ravel_pytree(g2)
    scale = float(jnp.max(jnp.abs(f1)))
    np.testing.assert_allclose(
        np.asarray(f2), np.asarray(f1), atol=2e-6 * max(scale, 1.0)
    )


def test_fused_block_train_step_equivalent():
    """Full jitted train step: same loss/grad-norm trajectory across the
    unfused path, the recompute-mode block kernel, and the round-4
    store+unroll block kernel (the TPU default combination)."""
    from glow_tts_train_tpu import training

    variants = {
        "unfused": {"flow_block_fuse": False},
        "fused_recompute": {"flow_block_fuse": True},
        "fused_store_unroll": {
            "flow_block_fuse": True,
            "wn_residuals": "store",
            "unroll_blocks": True,
        },
    }
    losses = {}
    for name, over in variants.items():
        config = dataclasses.replace(
            tiny_config(p_dropout=0.0, p_dropout_dec=0.0),
            wn_impl="pallas",
            remat_blocks="none",
            **over,
        )
        batch = random_batch(config, np.random.default_rng(7))
        state = training.create_state(config, jax.random.PRNGKey(0))
        step_fn = training.make_train_step(config, donate=False)
        for i in range(3):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        losses[name] = (float(metrics["loss"]), float(metrics["grad_norm"]))
    for name in ("fused_recompute", "fused_store_unroll"):
        assert np.allclose(losses[name], losses["unfused"], rtol=1e-5), (
            name, losses,
        )


def test_fused_block_roundtrip():
    """fwd (fused kernel) ∘ inv (fused inverse kernel) ≡ identity.

    Lengths must be multiples of n_sqz: squeeze drops an odd tail frame by
    construction (reference commons.py squeeze semantics), which is not a
    roundtrip property of the blocks."""
    _, hp_fused = _decoder_pair()
    params = flows.decoder_init(jax.random.PRNGKey(2), hp_fused)
    x, mask, _ = _inputs()
    mask = jnp.asarray(
        (np.arange(24)[None, :, None] < np.array([24, 18])[:, None, None])
        .astype(np.float32)
    )
    x = x * mask
    z, logdet = flows.decoder_fwd(params, x, mask, hp_fused, deterministic=True)
    x_back, _ = flows.decoder_inv(params, z, mask, hp_fused)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=2e-5)
    assert np.isfinite(np.asarray(logdet)).all()


def test_fused_block_dropout_fallback_off_tpu():
    """Off-TPU with dropout active, decoder_fwd silently takes the op-by-op
    body (the kernel's dropout needs the TPU PRNG) and matches it exactly."""
    hp_ref, hp_fused = _decoder_pair(p_dropout=0.3)
    params = flows.decoder_init(jax.random.PRNGKey(0), hp_ref)
    x, mask, _ = _inputs()
    rng = jax.random.PRNGKey(9)
    z1, ld1 = flows.decoder_fwd(
        params, x, mask, hp_ref, rng=rng, deterministic=False
    )
    z2, ld2 = flows.decoder_fwd(
        params, x, mask, hp_fused, rng=rng, deterministic=False
    )
    np.testing.assert_array_equal(np.asarray(z2), np.asarray(z1))
    np.testing.assert_array_equal(np.asarray(ld2), np.asarray(ld1))


@pytest.mark.parametrize(
    "over",
    [
        {},
        {"sigmoid_scale": True},
        {"gin_channels": 16},
        {"kernel_size": 3, "dilation_rate": 2, "n_layers": 3},
        {"n_split": 8, "n_sqz": 1},
    ],
    ids=["base", "sigmoid", "gin", "k3d2L3", "split8sqz1"],
)
@pytest.mark.parametrize("stored", [False, True], ids=["live_inv", "stored_inv"])
def test_fused_block_inverse_matches_op_by_op(over, stored):
    """decoder_inv with the fused inverse kernel ≡ the op-by-op inverse,
    both with a trace-time matrix inverse and with store_inverse'd weights
    (models.py:213-215)."""
    hp_ref, hp_fused = _decoder_pair(**over)
    params = flows.decoder_init(jax.random.PRNGKey(4), hp_ref)
    if stored:
        params = flows.decoder_store_inverse(params)
    z, mask, g = _inputs(gin=over.get("gin_channels", 0), seed=5)

    y1, _ = flows.decoder_inv(params, z, mask, hp_ref, g=g)
    y2, _ = flows.decoder_inv(params, z, mask, hp_fused, g=g)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=3e-6)


def test_fused_inverse_gen_path():
    """forward_gen (inference) with block_fuse on ≡ off, end to end."""
    import dataclasses as dc

    from glow_tts_train_tpu import models
    from glow_tts_train_tpu.models import hyper_from_config

    config = tiny_config(p_dropout=0.0, p_dropout_dec=0.0)
    outs = {}
    for fuse in (False, True):
        cfg = dc.replace(config, flow_block_fuse=fuse)
        hp = hyper_from_config(cfg)
        params = models.store_inverse(models.init_model(jax.random.PRNGKey(0), hp))
        x = jnp.asarray([[3, 7, 12, 5, 9, 14, 2, 4]], jnp.int32)
        out = models.forward_gen(
            params, hp, x, jnp.asarray([8], jnp.int32), y_max_length=64,
            noise_rng=jax.random.PRNGKey(1), noise_scale=0.667,
        )
        outs[fuse] = (np.asarray(out[0][0]), np.asarray(out[3]))
    np.testing.assert_array_equal(outs[True][1], outs[False][1])
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=2e-5)


@pytest.mark.parametrize("residuals", ["recompute", "store"])
def test_fused_block_inkernel_dropout_grads(residuals):
    """Autodiff-oracle check of the block kernel's custom-VJP gradients
    with in-kernel dropout ACTIVE: the kernel's own forward math is pure
    jnp, so running it outside Pallas with the same portable masks and
    jax.grad-ing it gives the exact jacobian the hand-written backward
    must reproduce — including the dropout branches the dropout-off
    parity tests cannot reach (store mode additionally exercises the
    PRNG keep-mask REPLAY in _block_bwd_store_kernel).  On a TPU backend
    the kernel is forced to interpret mode for that exact comparison (the
    real kernel draws hardware PRNG bits no oracle can replay) and the
    hardware path is additionally checked by central differences through
    the real kernel."""
    import jax.flatten_util as fu2
    from glow_tts_train_tpu.ops import block_pallas as bp
    from glow_tts_train_tpu.ops.wn_pallas import _offsets, portable_ops

    hp_ref, _ = _decoder_pair()
    params = flows.decoder_init(jax.random.PRNGKey(0), hp_ref)
    block0 = jax.tree_util.tree_map(lambda a: a[0], params["blocks"])
    x, mask, _ = _inputs()
    x_sq, mask_sq = flows.squeeze(x, mask, 2)
    b, t, c = x_sq.shape
    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal(x_sq.shape), jnp.float32
    )
    key = jax.random.PRNGKey(7)
    p_drop = 0.3

    def kernel_out(bparams, interpret=None):
        return bp.flow_block_fused(
            bparams, x_sq, mask_sq, None,
            hidden_channels=hp_ref.hidden_channels,
            dilation_rate=hp_ref.dilation_rate,
            n_layers=hp_ref.n_layers,
            n_split=hp_ref.n_split,
            p_dropout=p_drop,
            rng=key,
            deterministic=False,
            interpret=interpret,
            residuals=residuals,
        )

    thr = np.uint32(min(round(p_drop * 2 ** 32), 2 ** 32 - 1))
    st_tup = (
        hp_ref.n_layers,
        tuple(
            _offsets(hp_ref.kernel_size, hp_ref.dilation_rate ** l)
            for l in range(hp_ref.n_layers)
        ),
        thr,
        1.0 / (1.0 - p_drop),
        False,
    )
    st = dict(bp._st_from_key(bp._BlockKey(st_tup, True)), interpret=True)
    seed_f = jax.random.randint(
        key, (), minval=0, maxval=np.int32(2 ** 31 - 1), dtype=jnp.int32
    )
    mask_b = jnp.broadcast_to(mask_sq.astype(jnp.float32), (b, t, 1))

    def oracle_out(bparams):
        folded = bp.fold_block_params(
            bparams, hp_ref.n_layers, hp_ref.n_split, jnp.float32
        )
        g_all = jnp.zeros(
            (b, hp_ref.n_layers, 2 * hp_ref.hidden_channels), jnp.float32
        )
        zs, lds = [], []
        with portable_ops():
            for i in range(b):
                refs = (
                    folded["A"], folded["bA"].reshape(1, -1),
                    folded["W_s"], folded["b_s"].reshape(1, -1),
                    folded["W_e"], folded["b_e"].reshape(1, -1),
                    folded["W_in"], folded["b_in"],
                    folded["W_rs"], folded["b_rs"],
                    g_all[i : i + 1],
                )
                z, ld, _ = bp._block_fwd_math(
                    x_sq[i], mask_b[i], refs, dict(st, seed=seed_f + i)
                )
                zs.append(z)
                lds.append(ld)
        return jnp.stack(zs), jnp.stack(lds)

    z_k, ld_k = kernel_out(block0, interpret=True)
    z_o, ld_o = oracle_out(block0)
    np.testing.assert_allclose(np.asarray(z_o), np.asarray(z_k), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ld_o), np.asarray(ld_k), rtol=1e-5
    )

    def loss_k(bparams, interpret=True):
        z, ld = kernel_out(bparams, interpret=interpret)
        return jnp.sum(z * cot) + 0.1 * jnp.sum(ld)

    def loss_o(bparams):
        z, ld = oracle_out(bparams)
        return jnp.sum(z * cot) + 0.1 * jnp.sum(ld)

    f_k, _ = fu2.ravel_pytree(jax.grad(loss_k)(block0))
    f_o, _ = fu2.ravel_pytree(jax.grad(loss_o)(block0))
    scale = float(jnp.max(jnp.abs(f_o)))
    np.testing.assert_allclose(
        np.asarray(f_k), np.asarray(f_o), atol=3e-6 * max(scale, 1.0)
    )

    # hardware path: FD oracle through the real Mosaic kernel (TPU PRNG —
    # no portable oracle can replay its bits; masks are weight-independent
    # so central differences see identical masks)
    if jax.default_backend() == "tpu":
        fd_directional_grad_check(
            lambda p: loss_k(p, interpret=None), block0
        )


def test_fused_wn_inkernel_dropout_grads():
    """Same autodiff-oracle coverage for the WN kernel's dropout backward
    (both residuals modes)."""
    import jax.flatten_util as fu2
    from glow_tts_train_tpu.ops import wn_pallas as wp

    h, L = 16, 2
    wn = flows.wn_init(jax.random.PRNGKey(1), h, 3, L)
    ws0 = wp.fold_wn_weights(wn, L, jnp.float32)
    rng = np.random.default_rng(4)
    b, t = 2, 24
    x = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
    mask = jnp.ones((b, t, 1), jnp.float32)
    g_all = jnp.zeros((b, L, 2 * h), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
    p_drop = 0.3
    seed = jnp.int32(123)

    thr = np.uint32(min(round(p_drop * 2 ** 32), 2 ** 32 - 1))
    st = {
        "n_layers": L,
        "offs": tuple(wp._offsets(3, 1) for _ in range(L)),
        "drop_threshold": thr,
        "drop_scale": 1.0 / (1.0 - p_drop),
        "interpret": True,
    }

    def oracle_out(ws):
        W_in, b_in, W_rs, b_rs = ws
        outs = []
        with wp.portable_ops():
            for i in range(b):
                refs = (
                    W_in, b_in, W_rs, b_rs, g_all[i : i + 1], mask[i]
                )
                xcur = x[i]
                skip = jnp.zeros((t, h), jnp.float32)
                st_i = dict(st, seed=seed + i)
                for l in range(L):
                    xcur, skip_inc, _ = wp._layer_fwd(xcur, l, refs, st_i)
                    skip = skip + skip_inc.astype(jnp.float32)
                outs.append(skip)
        return jnp.stack(outs)

    for residuals in ("recompute", "store"):
        def kernel_out(ws, residuals=residuals, interpret=True):
            return wp.wn_stack_fused(
                ws[0], ws[1], ws[2], ws[3], x, mask, g_all, seed,
                kernel_size=3, dilation_rate=1, n_layers=L,
                p_dropout=p_drop, deterministic=False,
                residuals=residuals, interpret=interpret,
            )

        y_k = kernel_out(ws0)
        y_o = oracle_out(ws0)
        np.testing.assert_allclose(
            np.asarray(y_o), np.asarray(y_k), atol=1e-5,
            err_msg=residuals,
        )
        f_k, _ = fu2.ravel_pytree(
            jax.grad(lambda w: jnp.sum(kernel_out(w) * cot))(ws0)
        )
        f_o, _ = fu2.ravel_pytree(
            jax.grad(lambda w: jnp.sum(oracle_out(w) * cot))(ws0)
        )
        scale = float(jnp.max(jnp.abs(f_o)))
        np.testing.assert_allclose(
            np.asarray(f_k), np.asarray(f_o),
            atol=3e-6 * max(scale, 1.0), err_msg=residuals,
        )

        # hardware path: FD oracle through the real Mosaic kernel
        if jax.default_backend() == "tpu":
            fd_directional_grad_check(
                lambda w: jnp.sum(
                    kernel_out(w, interpret=None) * cot
                ),
                ws0,
            )


def test_long_utterance_bucket_step_on_tpu():
    """Regression (TPU-only): the fused block backward at long buckets
    needs more scoped-VMEM stack than the compiler's 16 MiB default —
    at t_y=1408 (t=704 squeezed, base config) the kernel + weight-grad
    accumulators need 17.23 MiB on v5e and the step failed to compile
    until make_train_step raised the limit via per-jit compiler_options
    (training._compiler_options / config.scoped_vmem_limit_kib).  Caught
    by the 400-utterance soak's precompile phase, not the bench shapes."""
    if jax.default_backend() != "tpu":
        pytest.skip("TPU-only: scoped-VMEM stack limit is a TPU concept")
    import numpy as np2

    from glow_tts_train_tpu import training
    from glow_tts_train_tpu.config import ModelConfig, TrainingConfig

    config = TrainingConfig(model=ModelConfig(num_symbols=44))
    rng = np2.random.default_rng(0)
    b, t_x, t_y = 8, 184, 1408
    batch = {
        "x": rng.integers(1, 44, size=(b, t_x)).astype(np2.int32),
        "x_lengths": np2.full((b,), t_x, np2.int32),
        "y": rng.standard_normal((b, t_y, 80)).astype(np2.float32),
        "y_lengths": np2.full((b,), t_y, np2.int32),
    }
    state = training.create_state(config, jax.random.PRNGKey(0))
    step = training.make_train_step(config, mas_impl="auto", donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np2.isfinite(float(metrics["loss"]))


def test_block_fuse_auto_resolution():
    """config flow_block_fuse="auto" follows the resolved wn_impl."""
    from glow_tts_train_tpu.models import hyper_from_config
    from glow_tts_train_tpu.models.glow_tts import _resolve_block_fuse

    hp = hyper_from_config(tiny_config())  # CPU backend under tests
    assert hp.block_fuse is False
    assert _resolve_block_fuse("auto", "pallas", "recompute") is True
    assert _resolve_block_fuse("auto", "xla", "recompute") is False
    # the block kernel supports the store backward too (round 4): the
    # store+unroll TPU default keeps the whole block fused
    assert _resolve_block_fuse("auto", "pallas", "store") is True
    assert _resolve_block_fuse(False, "pallas", "recompute") is False
    assert _resolve_block_fuse(True, "xla", "store") is True  # explicit wins


def test_stacked_inverse_fold_matches_per_block():
    """fold_blocks_stacked_inverse ≡ per-block fold_block_params_inverse,
    with and without store_inverse'd weights."""
    from glow_tts_train_tpu.ops import block_pallas as bp

    hp_ref, _ = _decoder_pair(gin_channels=16)
    params = flows.decoder_init(jax.random.PRNGKey(6), hp_ref)
    _, _, g = _inputs(gin=16)
    for stored in (False, True):
        blocks = (
            flows.decoder_store_inverse(params)["blocks"]
            if stored
            else params["blocks"]
        )
        folded_all, g_all = bp.fold_blocks_stacked_inverse(
            blocks, hp_ref.n_layers, hp_ref.n_split, jnp.float32,
            g, hp_ref.hidden_channels,
        )
        for i in range(hp_ref.n_blocks):
            blk = jax.tree_util.tree_map(lambda a: a[i], blocks)
            one = bp.fold_block_params_inverse(
                blk, hp_ref.n_layers, hp_ref.n_split, jnp.float32
            )
            for key in one:
                np.testing.assert_allclose(
                    np.asarray(folded_all[key][i]), np.asarray(one[key]),
                    rtol=1e-6, atol=1e-7, err_msg=f"{key} stored={stored}",
                )


def test_stacked_fold_matches_per_block():
    """fold_blocks_stacked (the vmapped whole-stack fold decoder_fwd scans
    over) must produce exactly the per-block fold_block_params tensors plus
    the actnorm/invconv logdet coefficients and conditioning pre-conv."""
    from glow_tts_train_tpu.ops import block_pallas as bp
    from glow_tts_train_tpu.ops.conv import conv1d

    hp_ref, _ = _decoder_pair(gin_channels=16)
    params = flows.decoder_init(jax.random.PRNGKey(3), hp_ref)
    _, _, g = _inputs(gin=16)
    c_sqz = hp_ref.in_channels * hp_ref.n_sqz

    stacked = bp.fold_blocks_stacked(
        params["blocks"], hp_ref.n_layers, hp_ref.n_split, jnp.float32,
        g, hp_ref.hidden_channels,
    )
    folded_all, logs_sum_all, logabsdet_all, g_all = stacked
    for i in range(hp_ref.n_blocks):
        blk = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
        one = bp.fold_block_params(
            blk, hp_ref.n_layers, hp_ref.n_split, jnp.float32
        )
        for key in one:
            np.testing.assert_allclose(
                np.asarray(folded_all[key][i]), np.asarray(one[key]),
                rtol=0, atol=0, err_msg=key,
            )
        np.testing.assert_allclose(
            float(logs_sum_all[i]),
            float(jnp.sum(blk["actnorm"]["logs"])), rtol=1e-6,
        )
        _, want_ld = jnp.linalg.slogdet(blk["invconv"]["weight"])
        np.testing.assert_allclose(
            float(logabsdet_all[i]), float(want_ld), rtol=1e-5,
        )
        want_g = conv1d(g, blk["coupling"]["wn"]["cond"]).reshape(
            g.shape[0], hp_ref.n_layers, 2 * hp_ref.hidden_channels
        )
        np.testing.assert_allclose(
            np.asarray(g_all[i]), np.asarray(want_g), rtol=1e-6, atol=1e-6,
        )
