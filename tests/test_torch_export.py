"""Reverse migration: exporting our checkpoints back to the reference
PyTorch format.

export_torch_state_dict must be the exact inverse of
import_torch_state_dict (reference checkpoint contract checkpoint.py:27-48,
state-dict layout per models.py/layers.py/attentions.py), so:

* torch → ours → torch roundtrips bit-identically,
* ours → torch loads into the actual reference FlowGenerator with
  strict=True and produces the same mels,
* the export CLI's --format torch artifact reads back through our own
  .pth importer losslessly.
"""

import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from glow_tts_train_tpu.checkpoint import (  # noqa: E402
    Checkpoint,
    export_torch_state_dict,
    import_torch_state_dict,
    load_checkpoint,
    save_checkpoint,
    save_torch_checkpoint,
)
from glow_tts_train_tpu.models import hyper_from_config, init_model  # noqa: E402

from helpers import tiny_config  # noqa: E402
from test_parity_torch import build_pair, reference_models  # noqa: E402,F401


def _tree_equal(a, b, msg=""):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(
        (jax.tree_util.keystr(p), leaf)
        for p, leaf in jax.tree_util.tree_leaves_with_path(b)
    )
    assert len(fa) == len(fb), (len(fa), len(fb), msg)
    for p, leaf in fa:
        key = jax.tree_util.keystr(p)
        np.testing.assert_array_equal(
            np.asarray(leaf, np.float32), np.asarray(fb[key], np.float32),
            err_msg=f"{msg}:{key}",
        )


@pytest.mark.parametrize(
    "over",
    [{}, {"n_speakers": 3, "gin_channels": 12}, {"window_size": None}],
    ids=["single", "multispeaker", "no_window"],
)
def test_state_dict_roundtrip_bijective(over):
    """ours -> torch keys -> ours is bit-identical (incl. multispeaker
    cond/emb_g; window_size=None has no emb_rel params at all), and
    torch -> ours -> torch covers every reference key."""
    config = tiny_config(**over)
    params = jax.tree_util.tree_map(
        np.asarray, init_model(jax.random.PRNGKey(0), hyper_from_config(config))
    )
    sd = export_torch_state_dict(params, config)
    if config.model.window_size is None:
        # mha_init creates no rel-pos tables then; the export must not
        # emit (or crash on) emb_rel keys the reference never registers
        assert not any("emb_rel" in k for k in sd)
    back = import_torch_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        config,
    )
    _tree_equal(back, params, "ours->torch->ours")

    sd2 = export_torch_state_dict(back, config)
    assert set(sd2.keys()) == set(sd.keys())
    for k in sd:
        np.testing.assert_array_equal(sd2[k], sd[k], err_msg=k)


def test_exported_state_dict_loads_into_reference(reference_models):  # noqa: F811
    """strict=True load into the real reference model, and the loaded model
    produces the same training-forward outputs as the original."""
    config = tiny_config()
    ref, params = build_pair(reference_models, config)

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_torch_state_dict(params, config).items()
    }
    torch.manual_seed(7)
    ref2, _ = build_pair(reference_models, config, seed=7)
    missing, unexpected = ref2.load_state_dict(sd, strict=True), None
    assert not missing.missing_keys and not missing.unexpected_keys

    rng = np.random.default_rng(1)
    x = torch.from_numpy(
        rng.integers(1, config.model.num_symbols, size=(2, 9)).astype(np.int64)
    )
    x_lengths = torch.tensor([9, 7])
    y = torch.from_numpy(
        rng.standard_normal((2, config.audio.mel_channels, 24)).astype(np.float32)
    )
    y_lengths = torch.tensor([24, 20])
    with torch.no_grad():
        out1 = ref(x, x_lengths, y, y_lengths, gen=False)
        out2 = ref2(x, x_lengths, y, y_lengths, gen=False)
    z1, z2 = out1[0][0], out2[0][0]
    np.testing.assert_array_equal(z2.numpy(), z1.numpy())


def test_export_cli_torch_format(tmp_path):
    """--format torch writes a reference-contract .pth that our own .pth
    importer reads back losslessly (weights + step metadata)."""
    config = tiny_config()
    params = jax.tree_util.tree_map(
        np.asarray, init_model(jax.random.PRNGKey(3), hyper_from_config(config))
    )
    ckpt = Checkpoint(
        params=params, opt_state=None, learning_rate=0.125, global_step=42,
        version=1,
    )
    save_checkpoint(ckpt, tmp_path / "checkpoint_42.npz")
    with open(tmp_path / "config.json", "w") as f:
        config.save(f)

    proc = subprocess.run(
        [
            sys.executable, "-m", "glow_tts_train_tpu.export",
            str(tmp_path / "checkpoint_42.npz"), str(tmp_path / "out"),
            "--config", str(tmp_path / "config.json"),
            "--format", "torch", "--platform", "cpu",
        ],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    pth = tmp_path / "out" / "generator.pth"
    assert pth.exists()

    loaded = torch.load(pth, map_location="cpu", weights_only=False)
    assert loaded["global_step"] == 42
    # weights-only export still carries a VALID (empty-state) Adam dict —
    # the reference loads the optimizer unconditionally on resume
    assert loaded["optimizer"]["state"] == {}
    assert len(loaded["optimizer"]["param_groups"]) == 1

    back = load_checkpoint(pth, config, load_optimizer=False)
    assert back.global_step == 42
    assert abs(back.learning_rate - 0.125) < 1e-9
    _tree_equal(back.params, params, "cli roundtrip")


def test_export_cli_torch_carries_adam_state(tmp_path):
    """The CLI must load the optimizer for --format torch: a checkpoint
    with real Adam moments exports a .pth whose optimizer state is
    populated (regression: load_optimizer=False silently zeroed it)."""
    import dataclasses

    from glow_tts_train_tpu import training
    from helpers import random_batch

    config = dataclasses.replace(
        tiny_config(p_dropout=0.0, p_dropout_dec=0.0), warmup_steps=10
    )
    state = training.create_state(config, jax.random.PRNGKey(0))
    step_fn = training.make_train_step(config, donate=False)
    state, _ = step_fn(
        state, random_batch(config, np.random.default_rng(2)),
        jax.random.PRNGKey(0),
    )
    ckpt = Checkpoint(
        params=jax.tree_util.tree_map(np.asarray, state.params),
        opt_state=state.opt_state, learning_rate=0.01, global_step=1,
        version=1,
    )
    save_checkpoint(ckpt, tmp_path / "checkpoint_1.npz")
    with open(tmp_path / "config.json", "w") as f:
        config.save(f)

    proc = subprocess.run(
        [
            sys.executable, "-m", "glow_tts_train_tpu.export",
            str(tmp_path / "checkpoint_1.npz"), str(tmp_path / "out"),
            "--config", str(tmp_path / "config.json"),
            "--format", "torch", "--platform", "cpu",
        ],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    loaded = torch.load(
        tmp_path / "out" / "generator.pth", map_location="cpu",
        weights_only=False,
    )
    n_params = len(loaded["model"])
    assert len(loaded["optimizer"]["state"]) == n_params
    st0 = loaded["optimizer"]["state"][0]
    assert int(st0["step"]) == 1
    assert float(np.abs(st0["exp_avg"].numpy()).sum()) > 0.0


def test_save_torch_checkpoint_direct(tmp_path):
    """Multispeaker direct save: emb_g + cond make it into the .pth."""
    config = tiny_config(n_speakers=3, gin_channels=12)
    params = jax.tree_util.tree_map(
        np.asarray, init_model(jax.random.PRNGKey(5), hyper_from_config(config))
    )
    ckpt = Checkpoint(
        params=params, opt_state=None, learning_rate=1.0, global_step=1,
        version=1,
    )
    save_torch_checkpoint(ckpt, config, tmp_path / "g.pth")
    sd = torch.load(tmp_path / "g.pth", map_location="cpu", weights_only=False)
    assert "emb_g.weight" in sd["model"]
    assert any("cond_layer" in k for k in sd["model"])
    back = load_checkpoint(tmp_path / "g.pth", config, load_optimizer=False)
    _tree_equal(back.params, params, "multispeaker")


@pytest.mark.parametrize(
    "over",
    [{}, {"n_speakers": 3, "gin_channels": 12}, {"mean_only": True},
     {"prenet": False}],
    ids=["base", "multispeaker", "mean_only", "no_prenet"],
)
def test_reference_param_order_matches_model(reference_models, over):  # noqa: F811
    """_reference_param_order must equal the live reference model's
    state_dict key order (== parameters() order == Adam state indices)."""
    from glow_tts_train_tpu.checkpoint import _reference_param_order

    config = tiny_config(**over)
    ref, _ = build_pair(reference_models, config)
    assert _reference_param_order(config) == list(ref.state_dict().keys())


def test_optimizer_export_roundtrip_and_reference_resume(
    reference_models, tmp_path  # noqa: F811
):
    """Adam moments survive ours -> torch -> ours bit-identically, and the
    actual reference stack (model + torch Adam) resumes from the exported
    .pth without error."""
    import dataclasses

    from glow_tts_train_tpu import training
    from glow_tts_train_tpu.checkpoint import (
        export_torch_opt_state,
        import_torch_opt_state,
    )
    from helpers import random_batch

    config = dataclasses.replace(
        tiny_config(p_dropout=0.0, p_dropout_dec=0.0), warmup_steps=10
    )
    state = training.create_state(config, jax.random.PRNGKey(0))
    step_fn = training.make_train_step(config, donate=False)
    batch = random_batch(config, np.random.default_rng(5))
    for i in range(3):
        state, _ = step_fn(state, batch, jax.random.PRNGKey(i))

    params = jax.tree_util.tree_map(np.asarray, state.params)
    opt_sd = export_torch_opt_state(state.opt_state, params, config, 0.01)
    model_sd = export_torch_state_dict(params, config)

    # bit-exact moment roundtrip through the torch layout
    back = import_torch_opt_state(
        opt_sd,
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in model_sd.items()},
        config,
        params,
    )
    assert back is not None

    def adam_state(opt_state):
        for st in opt_state:
            if hasattr(st, "mu"):
                return st
        raise AssertionError("no adam state")

    ours, theirs = adam_state(state.opt_state), adam_state(back)
    _tree_equal(theirs.mu, jax.tree_util.tree_map(np.asarray, ours.mu), "mu")
    _tree_equal(theirs.nu, jax.tree_util.tree_map(np.asarray, ours.nu), "nu")
    assert int(theirs.count) == int(ours.count)

    # the real reference stack resumes: strict model load + Adam
    # load_state_dict + one optimization step
    ckpt = Checkpoint(
        params=params, opt_state=state.opt_state, learning_rate=0.01,
        global_step=3, version=1,
    )
    save_torch_checkpoint(ckpt, config, tmp_path / "g.pth")
    loaded = torch.load(
        tmp_path / "g.pth", map_location="cpu", weights_only=False
    )
    ref, _ = build_pair(reference_models, config, seed=9)
    res = ref.load_state_dict(loaded["model"], strict=True)
    assert not res.missing_keys and not res.unexpected_keys
    opt = torch.optim.Adam(
        ref.parameters(), lr=loaded["learning_rate"],
        betas=tuple(config.betas), eps=config.eps,
    )
    opt.load_state_dict(loaded["optimizer"])
    ref.train()
    loss = sum((p ** 2).sum() for p in ref.parameters())
    loss.backward()
    opt.step()  # applies the imported moments; crash-free is the contract
