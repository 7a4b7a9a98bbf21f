"""Numerical parity against the actual PyTorch reference.

Loads the reference package from /root/reference (read-only), builds a tiny
FlowGenerator with fixed seeds, maps its state dict onto our params via
checkpoint.import_torch_state_dict, and compares forward outputs:

* training forward: z, logdet, z_m, logw, logw_ (reference models.py:310-399)
* generation forward with noise_scale=0: mel within 1e-3 max abs error — the
  BASELINE.md parity target

The reference's Cython monotonic_align extension is not built here, so it is
stubbed with our numpy oracle (same core.pyx semantics, tested in
test_mas.py) before importing reference models.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from glow_tts_train_tpu.checkpoint import import_torch_state_dict
from glow_tts_train_tpu.models import (
    forward_gen,
    forward_train,
    hyper_from_config,
)
from glow_tts_train_tpu.ops.mas import maximum_path_numpy

from helpers import tiny_config

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="module")
def reference_models():
    """Import reference glow_tts_train.models with a stubbed MAS extension."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    # the reference calls the removed torch.qr (layers.py:233)
    if not hasattr(torch, "qr"):
        torch.qr = torch.linalg.qr  # type: ignore[attr-defined]

    shim = types.ModuleType("glow_tts_train.monotonic_align")

    def maximum_path(logp, mask):
        path = maximum_path_numpy(
            logp.detach().cpu().numpy().astype(np.float32),
            mask.detach().cpu().numpy().astype(np.float32),
        )
        return torch.from_numpy(np.ascontiguousarray(path)).to(dtype=logp.dtype)

    shim.maximum_path = maximum_path
    sys.modules["glow_tts_train.monotonic_align"] = shim

    from glow_tts_train import models as ref_models  # noqa: E402

    return ref_models


def build_pair(reference_models, config, seed=0):
    """Build (torch model, our params) with identical weights."""
    m = config.model
    torch.manual_seed(seed)
    ref = reference_models.FlowGenerator(
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
    )
    ref.eval()
    params = import_torch_state_dict(ref.state_dict(), config)
    return ref, params


def make_inputs(config, b=3, t_x=9, t_y=24, seed=1):
    rng = np.random.default_rng(seed)
    x = rng.integers(1, config.model.num_symbols, size=(b, t_x)).astype(np.int64)
    x_lengths = np.asarray([t_x, t_x - 2, t_x - 3], np.int64)[:b]
    for i in range(b):
        x[i, x_lengths[i]:] = 0
    y_lengths = np.asarray([t_y, t_y - 5, t_y - 8], np.int64)[:b]
    y = rng.standard_normal((b, config.audio.mel_channels, t_y)).astype(np.float32)
    for i in range(b):
        y[i, :, y_lengths[i]:] = 0
    return x, x_lengths, y, y_lengths


def test_train_forward_parity(reference_models):
    config = tiny_config()
    ref, params = build_pair(reference_models, config)
    x, x_lengths, y, y_lengths = make_inputs(config)

    with torch.no_grad():
        (
            (z_t, z_m_t, z_logs_t, logdet_t, z_mask_t),
            (x_m_t, x_logs_t, x_mask_t),
            (attn_t, logw_t, logw__t),
        ) = ref(
            torch.from_numpy(x),
            torch.from_numpy(x_lengths),
            torch.from_numpy(y),
            torch.from_numpy(y_lengths),
        )

    hp = hyper_from_config(config)
    (
        (z_j, z_m_j, z_logs_j, logdet_j, z_mask_j),
        (x_m_j, x_logs_j, x_mask_j),
        (attn_j, logw_j, logw__j),
    ) = forward_train(
        params,
        hp,
        jnp.asarray(x, jnp.int32),
        jnp.asarray(x_lengths, jnp.int32),
        jnp.asarray(y.transpose(0, 2, 1)),  # [b,c,t] -> [b,t,c]
        jnp.asarray(y_lengths, jnp.int32),
        deterministic=True,
    )

    def t2n_ct(a):  # torch [b,c,t] -> channels-last numpy
        return a.numpy().transpose(0, 2, 1)

    np.testing.assert_allclose(
        np.asarray(x_m_j), t2n_ct(x_m_t), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(logw_j)[:, :, 0], logw_t.numpy()[:, 0, :], atol=2e-5, rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(z_j), t2n_ct(z_t), atol=5e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(logdet_j), logdet_t.numpy(), atol=1e-3, rtol=1e-5
    )
    # MAS path: identical alignment from identical logp
    np.testing.assert_array_equal(
        np.asarray(attn_j), attn_t.numpy()[:, 0, :, :]
    )
    np.testing.assert_allclose(
        np.asarray(z_m_j), t2n_ct(z_m_t), atol=5e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(logw__j)[:, :, 0], logw__t.numpy()[:, 0, :], atol=5e-5, rtol=1e-5
    )

    # losses
    from glow_tts_train_tpu.models import duration_loss, mle_loss

    l_mle_j = float(mle_loss(z_j, z_m_j, z_logs_j, logdet_j, z_mask_j))
    l_len_j = float(
        duration_loss(logw_j, logw__j, jnp.asarray(x_lengths, jnp.int32))
    )
    # reference loss formulas (utils.py:14-28) computed in torch
    import math

    loss_t = (
        torch.sum(z_logs_t)
        + 0.5 * torch.sum(torch.exp(-2 * z_logs_t) * ((z_t - z_m_t) ** 2))
        - torch.sum(logdet_t)
    ) / torch.sum(torch.ones_like(z_t) * z_mask_t) + 0.5 * math.log(2 * math.pi)
    dur_t = torch.sum((logw_t - logw__t) ** 2) / torch.sum(
        torch.from_numpy(x_lengths)
    )
    np.testing.assert_allclose(l_mle_j, float(loss_t), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(l_len_j, float(dur_t), atol=1e-5, rtol=1e-5)


def test_gen_forward_parity(reference_models):
    """noise_scale=0 generation: <1e-3 max mel abs error (BASELINE.md)."""
    config = tiny_config()
    ref, params = build_pair(reference_models, config)
    x, x_lengths, _, _ = make_inputs(config)

    with torch.no_grad():
        # the reference requires store_inverse() before reverse flows
        # (layers.py:255 would conv with a None weight otherwise; every
        # reference inference path calls it, infer.py:116)
        ref.decoder.store_inverse()
        (y_t, *_), _, _ = ref(
            torch.from_numpy(x),
            torch.from_numpy(x_lengths),
            gen=True,
            noise_scale=0.0,
            length_scale=1.0,
        )

    hp = hyper_from_config(config)
    t_y_ref = y_t.shape[2]
    y_max = ((t_y_ref + 15) // 16 + 1) * 16
    (y_j, _, _, _), _, _, y_lengths_j = forward_gen(
        params,
        hp,
        jnp.asarray(x, jnp.int32),
        jnp.asarray(x_lengths, jnp.int32),
        y_max_length=y_max,
        noise_rng=jax.random.PRNGKey(0),
        noise_scale=0.0,
        length_scale=1.0,
    )

    y_j = np.asarray(y_j).transpose(0, 2, 1)  # -> [b, c, t]
    y_t = y_t.numpy()
    y_lengths_j = np.asarray(y_lengths_j)
    # reference pads outputs to the longest sample in batch
    assert int(y_lengths_j.max()) == t_y_ref
    for i in range(y_t.shape[0]):
        L = int(y_lengths_j[i])
        err = np.abs(y_j[i, :, :L] - y_t[i, :, :L]).max()
        assert err < 1e-3, f"sample {i}: max mel abs err {err}"
        # beyond each sample's length both are masked to zero
        assert np.abs(y_j[i, :, L:]).max() == 0


def test_gen_forward_parity_length_scale(reference_models):
    config = tiny_config()
    ref, params = build_pair(reference_models, config)
    x, x_lengths, _, _ = make_inputs(config)

    with torch.no_grad():
        ref.decoder.store_inverse()
        (y_t, *_), _, _ = ref(
            torch.from_numpy(x),
            torch.from_numpy(x_lengths),
            gen=True,
            noise_scale=0.0,
            length_scale=1.7,
        )
    hp = hyper_from_config(config)
    y_max = ((y_t.shape[2] + 15) // 16 + 1) * 16
    (y_j, _, _, _), _, _, y_lengths_j = forward_gen(
        params, hp,
        jnp.asarray(x, jnp.int32), jnp.asarray(x_lengths, jnp.int32),
        y_max_length=y_max, noise_rng=jax.random.PRNGKey(0),
        noise_scale=0.0, length_scale=1.7,
    )
    assert int(np.asarray(y_lengths_j).max()) == y_t.shape[2]
    y_j = np.asarray(y_j).transpose(0, 2, 1)
    L = int(np.asarray(y_lengths_j)[0])
    assert np.abs(y_j[0, :, :L] - y_t.numpy()[0, :, :L]).max() < 1e-3


def test_multispeaker_parity(reference_models):
    config = tiny_config(n_speakers=3, gin_channels=4)
    ref, params = build_pair(reference_models, config, seed=2)
    x, x_lengths, y, y_lengths = make_inputs(config)
    g = np.asarray([0, 2, 1], np.int64)

    with torch.no_grad():
        ((z_t, z_m_t, *_), _, (attn_t, logw_t, _)) = ref(
            torch.from_numpy(x),
            torch.from_numpy(x_lengths),
            torch.from_numpy(y),
            torch.from_numpy(y_lengths),
            g=torch.from_numpy(g),
        )

    hp = hyper_from_config(config)
    ((z_j, z_m_j, *_), _, (attn_j, logw_j, _)) = forward_train(
        params, hp,
        jnp.asarray(x, jnp.int32), jnp.asarray(x_lengths, jnp.int32),
        jnp.asarray(y.transpose(0, 2, 1)), jnp.asarray(y_lengths, jnp.int32),
        g_ids=jnp.asarray(g, jnp.int32),
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(z_j), z_t.numpy().transpose(0, 2, 1), atol=5e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(logw_j)[:, :, 0], logw_t.numpy()[:, 0, :], atol=2e-5, rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(attn_j), attn_t.numpy()[:, 0])


def test_base_dims_parity(reference_models):
    """Full Glow-TTS base channel dims (192 hidden, 12 flow blocks, 80 mels)
    on short sequences: gen-mode mel must stay under the 1e-3 target."""
    from glow_tts_train_tpu.config import TrainingConfig

    config = TrainingConfig()
    config.model.num_symbols = 50
    config.bucket_size_text = 1
    config.bucket_size_mel = 1
    ref, params = build_pair(reference_models, config, seed=5)

    rng = np.random.default_rng(9)
    b, t_x = 2, 12
    x = rng.integers(1, 50, size=(b, t_x)).astype(np.int64)
    x_lengths = np.asarray([t_x, t_x - 4], np.int64)
    x[1, t_x - 4:] = 0

    with torch.no_grad():
        ref.decoder.store_inverse()
        (y_t, *_), _, _ = ref(
            torch.from_numpy(x),
            torch.from_numpy(x_lengths),
            gen=True,
            noise_scale=0.0,
        )

    hp = hyper_from_config(config)
    y_max = ((y_t.shape[2] + 15) // 16 + 1) * 16
    (y_j, _, _, _), _, _, y_lengths_j = forward_gen(
        params, hp,
        jnp.asarray(x, jnp.int32), jnp.asarray(x_lengths, jnp.int32),
        y_max_length=y_max, noise_rng=jax.random.PRNGKey(0), noise_scale=0.0,
    )
    assert int(np.asarray(y_lengths_j).max()) == y_t.shape[2]
    y_j = np.asarray(y_j).transpose(0, 2, 1)
    for i in range(b):
        L = int(np.asarray(y_lengths_j)[i])
        err = np.abs(y_j[i, :, :L] - y_t.numpy()[i, :, :L]).max()
        assert err < 1e-3, f"sample {i}: max mel abs err {err}"


def test_mean_only_false_parity(reference_models):
    """proj_s log-scale head active (mean_only=False): z/logdet/attn parity."""
    config = tiny_config(mean_only=False)
    ref, params = build_pair(reference_models, config, seed=7)
    assert "proj_s" in params
    x, x_lengths, y, y_lengths = make_inputs(config, seed=8)

    with torch.no_grad():
        ((z_t, z_m_t, z_logs_t, logdet_t, _), (x_m_t, x_logs_t, _),
         (attn_t, _, _)) = ref(
            torch.from_numpy(x), torch.from_numpy(x_lengths),
            torch.from_numpy(y), torch.from_numpy(y_lengths),
        )
    assert float(x_logs_t.abs().max()) > 0  # head is live

    hp = hyper_from_config(config)
    ((z_j, z_m_j, z_logs_j, logdet_j, _), (x_m_j, x_logs_j, _),
     (attn_j, _, _)) = forward_train(
        params, hp,
        jnp.asarray(x, jnp.int32), jnp.asarray(x_lengths, jnp.int32),
        jnp.asarray(y.transpose(0, 2, 1)), jnp.asarray(y_lengths, jnp.int32),
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(x_logs_j), x_logs_t.numpy().transpose(0, 2, 1),
        atol=2e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(z_logs_j), z_logs_t.numpy().transpose(0, 2, 1),
        atol=5e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(logdet_j), logdet_t.numpy(), atol=1e-3, rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(attn_j), attn_t.numpy()[:, 0])


def test_finetune_from_reference_pth(reference_models, tmp_path):
    """The fine-tuning workflow on a published reference checkpoint: save a
    reference-format .pth ({model: state_dict, global_step, learning_rate,
    version}, checkpoint.py:38-46 in the reference), load it through
    load_checkpoint, and take a real training step from the imported state —
    step counter continues from the checkpoint, loss is finite, params move."""
    from glow_tts_train_tpu import training
    from glow_tts_train_tpu.checkpoint import load_checkpoint
    from glow_tts_train_tpu.optimize import make_optimizer

    import jax.flatten_util

    config = tiny_config()
    ref, _ = build_pair(reference_models, config)
    pth_path = tmp_path / "checkpoint_570000.pth"
    torch.save(
        {
            "model": ref.state_dict(),
            "global_step": 570000,
            "learning_rate": 2.4e-4,
            "version": 1,
        },
        pth_path,
    )

    ckpt = load_checkpoint(pth_path, config)
    assert ckpt.global_step == 570000
    assert ckpt.opt_state is None  # torch Adam state is not importable

    tx = make_optimizer(config)
    flat0 = jax.flatten_util.ravel_pytree(ckpt.params)[0]
    state = training.TrainState(
        ckpt.params,
        jax.jit(tx.init)(ckpt.params),
        jnp.asarray(ckpt.global_step, jnp.int32),
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in zip(
            ("x", "x_lengths", "y", "y_lengths"),
            make_inputs(config),
        )
    }
    batch["x"] = batch["x"].astype(jnp.int32)
    batch["y"] = jnp.transpose(batch["y"], (0, 2, 1))  # [b, t, c]

    step_fn = training.make_train_step(config, donate=False)
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 570001
    flat1 = jax.flatten_util.ravel_pytree(new_state.params)[0]
    assert float(jnp.max(jnp.abs(flat1 - flat0))) > 0


def test_torch_adam_state_imports(reference_models, tmp_path):
    """The reference checkpoint's torch.optim.Adam state maps onto our
    optax state: moments land on the right tree leaves (same per-tensor
    reorderings as the weights), the step count continues, and a training
    step runs from the imported state."""
    from glow_tts_train_tpu import training
    from glow_tts_train_tpu.checkpoint import load_checkpoint

    config = tiny_config()
    ref, _ = build_pair(reference_models, config)

    opt = torch.optim.Adam(ref.parameters(), lr=1e-4)
    for _ in range(3):  # populate exp_avg/exp_avg_sq/step for every param
        opt.zero_grad()
        loss = sum(p.float().sum() for p in ref.parameters())
        loss.backward()
        opt.step()

    pth_path = tmp_path / "checkpoint_300.pth"
    torch.save(
        {
            "model": ref.state_dict(),
            "optimizer": opt.state_dict(),
            "global_step": 300,
            "learning_rate": 2e-4,
            "version": 1,
        },
        pth_path,
    )

    ckpt = load_checkpoint(pth_path, config)
    assert ckpt.opt_state is not None, "torch Adam state should import"
    adam = ckpt.opt_state[1]
    assert int(adam.count) == 3
    assert int(ckpt.opt_state[2].count) == 3  # Noam schedule continues

    # spot-check moment mapping: the embedding's exp_avg lands on mu["emb"]
    emb_exp_avg = opt.state_dict()["state"][0]["exp_avg"].numpy()
    np.testing.assert_allclose(
        np.asarray(adam.mu["emb"]), emb_exp_avg, rtol=1e-6
    )
    # ...and a conv moment gets the same [out,in,k]->[k,in,out] transform
    names = [n for n, _ in ref.named_parameters()]
    i_proj_m = names.index("encoder.proj_m.weight")
    pm_exp_sq = opt.state_dict()["state"][i_proj_m]["exp_avg_sq"].numpy()
    np.testing.assert_allclose(
        np.asarray(adam.nu["proj_m"]["w"]),
        pm_exp_sq.transpose(2, 1, 0),
        rtol=1e-6,
    )

    # the imported state trains
    state = training.TrainState(
        ckpt.params, ckpt.opt_state, jnp.asarray(ckpt.global_step, jnp.int32)
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in zip(("x", "x_lengths", "y", "y_lengths"), make_inputs(config))
    }
    batch["x"] = batch["x"].astype(jnp.int32)
    batch["y"] = jnp.transpose(batch["y"], (0, 2, 1))
    step_fn = training.make_train_step(config, donate=False)
    _, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_training_trajectory(reference_models):
    """N optimization steps of this framework track N steps of the torch
    reference: identical initial weights (importer), identical data and
    hyperparameters, fp32 on CPU, dropout off (independent RNGs would
    diverge by construction).  This pins losses + value-clip + Adam + Noam
    + MAS *jointly* — the one semantic surface single-step tests miss:
    reference train.py:91-150 (step), optimize.py:32-55 (Noam-Adam),
    utils.py:118-132 (value clip).

    MAS tie-breaks could legitimately diverge on exact float ties; none
    occur at these sizes (the forward-parity test asserts identical
    alignments from identical weights, and the tolerance below fails on
    any systematic drift).
    """
    import dataclasses

    from glow_tts_train_tpu import training
    from glow_tts_train_tpu.optimize import make_optimizer

    sys.path.insert(0, REFERENCE_PATH) if REFERENCE_PATH not in sys.path else None
    from glow_tts_train import optimize as ref_optimize
    from glow_tts_train.utils import (
        clip_grad_value_ as ref_clip,
        duration_loss as ref_duration_loss,
        mle_loss as ref_mle_loss,
    )

    n_steps = 30
    # prenet=False: the reference hardcodes p=0.5 dropout inside the prenet
    # (models.py:100) — its zero-init projection makes the FORWARD
    # dropout-invariant at init, but grad(proj.w) depends on the dropout
    # masks, so "p_dropout=0" configs still carry hidden randomness that
    # would diverge the two frameworks' trajectories by construction.
    config = tiny_config(p_dropout=0.0, p_dropout_dec=0.0, prenet=False)
    # eps=1e-3 (not the 1e-9 default): Adam's g/(sqrt(v)+eps) amplifies any
    # round-off-dominated gradient element to a FULL +-lr step with an
    # implementation-dependent sign — e.g. the attention key bias, whose
    # true gradient is exactly zero by softmax shift-invariance, draws its
    # fp32 round-off sign from conv summation order.  A larger eps keeps
    # those elements near zero without touching real gradients (O(0.1-1)),
    # so the tolerance below stays tight enough to catch genuine semantic
    # drift (wrong clip, schedule off-by-one, beta/bias-correction bugs).
    config = dataclasses.replace(config, warmup_steps=15, eps=1e-3)
    ref, params = build_pair(reference_models, config)
    ref.train()

    ref_opt = ref_optimize.Adam(
        ref.parameters(),
        scheduler=config.scheduler,
        dim_model=config.model.hidden_channels,
        warmup_steps=config.warmup_steps,
        lr=config.learning_rate,
        betas=config.betas,
        eps=config.eps,
    )

    # two alternating batches: lr schedule + moments interact with data
    batches = [make_inputs(config, seed=s) for s in (1, 2)]

    tx = make_optimizer(config)
    state = training.TrainState(
        params, jax.jit(tx.init)(params), jnp.asarray(1, jnp.int32)
    )
    step_fn = training.make_train_step(config, donate=False)

    losses_t, losses_j, lrs_t, lrs_j = [], [], [], []
    from glow_tts_train_tpu.optimize import current_lr

    for step in range(n_steps):
        x, x_lengths, y, y_lengths = batches[step % len(batches)]

        # --- reference step (train.py:116-146, fp32 path) ---
        ref_opt.zero_grad()
        (
            (z, z_m, z_logs, logdet, z_mask),
            _,
            (_, logw, logw_),
        ) = ref(
            torch.from_numpy(x),
            torch.from_numpy(x_lengths),
            torch.from_numpy(y),
            torch.from_numpy(y_lengths),
        )
        loss_t = ref_mle_loss(z, z_m, z_logs, logdet, z_mask) + ref_duration_loss(
            logw, logw_, torch.from_numpy(x_lengths)
        )
        lrs_t.append(ref_opt.get_lr())
        loss_t.backward()
        ref_clip(ref.parameters(), config.grad_clip)
        ref_opt.step()
        losses_t.append(float(loss_t))

        # --- our step ---
        batch = {
            "x": jnp.asarray(x, jnp.int32),
            "x_lengths": jnp.asarray(x_lengths, jnp.int32),
            "y": jnp.asarray(y.transpose(0, 2, 1)),
            "y_lengths": jnp.asarray(y_lengths, jnp.int32),
        }
        lrs_j.append(current_lr(config, int(state.step)))
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(step))
        losses_j.append(float(metrics["loss"]))

    losses_t = np.asarray(losses_t)
    losses_j = np.asarray(losses_j)
    # the schedules must agree exactly (same closed form, same indexing)
    np.testing.assert_allclose(lrs_j, lrs_t, rtol=1e-6)
    # loss must actually move for the comparison to mean anything
    assert losses_t[-1] < losses_t[0] - 0.1
    # per-step tracking: fp32 round-off compounds through the moments, so
    # the budget grows linearly with step; any real semantic drift (wrong
    # clip, schedule off-by-one, moment decay mismatch) blows through it
    # within a few steps
    budget = 5e-4 * (1.0 + np.arange(n_steps))
    err = np.abs(losses_j - losses_t)
    assert (err <= budget).all(), (
        f"trajectory diverged: max err {err.max():.2e} at step {err.argmax()}"
        f"\nref  {losses_t[:8]}\nours {losses_j[:8]}"
    )
