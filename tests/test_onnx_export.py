"""Native ONNX export ↔ live-graph parity.

The exporter (glow_tts_train_tpu.onnx.export) hand-builds the generation
graph as opset-12 ONNX; these tests run the artifact under the pure-numpy
executor (onnx.runtime) and require numeric agreement with the live JAX
``forward_gen`` at noise=0 — the end-to-end proof the reference gets from
torch.onnx.export + onnxruntime (reference export_onnx.py:105-118,
infer_onnx.py:120-128), with no third-party ONNX packages involved.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glow_tts_train_tpu.models import (
    forward_gen,
    hyper_from_config,
    init_model,
    store_inverse,
)
from glow_tts_train_tpu.onnx import OnnxRuntime
from glow_tts_train_tpu.onnx.export import export_generator_onnx

from helpers import tiny_config


def _make(config, seed=0):
    hp = hyper_from_config(config)
    params = store_inverse(init_model(jax.random.PRNGKey(seed), hp))
    return hp, params


def _batch(config, b=2, t_x=9, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(1, config.model.num_symbols, size=(b, t_x)).astype(np.int64)
    x_lengths = np.linspace(t_x, max(3, t_x - 4), b).astype(np.int64)
    for i in range(b):
        x[i, x_lengths[i] :] = 0
    return x, x_lengths


def _assert_parity(config, hp, params, x, x_lengths, length_scale=1.0,
                   speaker=None, atol=2e-4):
    sess = OnnxRuntime(
        export_generator_onnx(params, config, speaker=speaker or 0), seed=0
    )
    mel, mel_lengths = sess.run(
        None,
        {
            "input": x,
            "input_lengths": x_lengths,
            "scales": np.array([0.0, length_scale], np.float32),
        },
    )

    g_ids = None
    if speaker is not None:
        g_ids = jnp.full((x.shape[0],), speaker, jnp.int32)
    (y, _, _, _), _, _, y_lengths = forward_gen(
        params,
        hp,
        jnp.asarray(x, jnp.int32),
        jnp.asarray(x_lengths, jnp.int32),
        y_max_length=256,
        noise_rng=jax.random.PRNGKey(1),
        noise_scale=0.0,
        length_scale=length_scale,
        g_ids=g_ids,
    )
    y = np.asarray(y)
    y_lengths = np.asarray(y_lengths)

    assert mel.shape[1] == config.audio.mel_channels
    assert list(mel_lengths) == list(y_lengths), (mel_lengths, y_lengths)
    assert mel.shape[2] == int(y_lengths.max())
    for i in range(x.shape[0]):
        n = int(y_lengths[i])
        np.testing.assert_allclose(
            mel[i, :, :n], y[i, :n, :].T, rtol=1e-4, atol=atol
        )
    return mel, mel_lengths


def test_parity_default_config():
    """tiny_config: prenet on, mean_only, rel-pos window 4, n_sqz 2 — the
    reference's shipped architecture shape."""
    config = tiny_config()
    hp, params = _make(config)
    x, x_lengths = _batch(config)
    _assert_parity(config, hp, params, x, x_lengths)


def test_parity_scale_proj_and_sigmoid_scale():
    """mean_only=False exercises proj_s; sigmoid_scale the coupling's
    alternative scale parametrization (attentions.py:131-137 semantics)."""
    config = tiny_config(mean_only=False, sigmoid_scale=True, prenet=False)
    hp, params = _make(config, seed=1)
    x, x_lengths = _batch(config, seed=1)
    _assert_parity(config, hp, params, x, x_lengths)


def test_parity_multispeaker_bakes_voice():
    """Speaker conditioning folds to constants; different speakers produce
    different artifacts (reference: one .onnx per voice)."""
    config = tiny_config(n_speakers=3, gin_channels=4)
    hp, params = _make(config, seed=2)
    x, x_lengths = _batch(config, seed=2)
    mel0, _ = _assert_parity(config, hp, params, x, x_lengths, speaker=0)
    mel1, _ = _assert_parity(config, hp, params, x, x_lengths, speaker=1)
    n = min(mel0.shape[2], mel1.shape[2])
    assert (
        mel0.shape != mel1.shape
        or np.abs(mel0[..., :n] - mel1[..., :n]).max() > 1e-6
    )


def test_parity_no_window_no_prenet():
    """window_size=None drops the rel-pos machinery entirely."""
    config = tiny_config(window_size=None, prenet=False)
    hp, params = _make(config, seed=3)
    x, x_lengths = _batch(config, seed=3)
    _assert_parity(config, hp, params, x, x_lengths)


def test_parity_length_scale():
    """length_scale rides the scales[1] input and changes durations."""
    config = tiny_config()
    hp, params = _make(config)
    x, x_lengths = _batch(config)
    _, n1 = _assert_parity(config, hp, params, x, x_lengths, length_scale=1.0)
    _, n2 = _assert_parity(config, hp, params, x, x_lengths, length_scale=2.0)
    assert all(int(b) >= int(a) for a, b in zip(n1, n2))
    assert int(n2[0]) > int(n1[0])


def test_noise_path_runs_and_perturbs():
    """noise_scale > 0 exercises RandomNormalLike: finite output, different
    from the deterministic one, and seeded-reproducible in the native
    runtime (onnxruntime-compatible session seeding)."""
    config = tiny_config()
    _, params = _make(config)
    x, x_lengths = _batch(config, b=1)
    blob = export_generator_onnx(params, config)
    feeds = lambda ns: {  # noqa: E731
        "input": x,
        "input_lengths": x_lengths,
        "scales": np.array([ns, 1.0], np.float32),
    }
    mel0 = OnnxRuntime(blob, seed=0).run(None, feeds(0.0))[0]
    mel1 = OnnxRuntime(blob, seed=0).run(None, feeds(0.667))[0]
    mel1b = OnnxRuntime(blob, seed=0).run(None, feeds(0.667))[0]
    mel2 = OnnxRuntime(blob, seed=7).run(None, feeds(0.667))[0]
    assert np.isfinite(mel1).all()
    assert np.abs(mel1 - mel0).max() > 1e-3
    np.testing.assert_array_equal(mel1, mel1b)
    assert np.abs(mel2 - mel1).max() > 1e-6


def test_dynamic_batch_and_length():
    """One artifact serves any batch size and phoneme length (the dynamic
    axes of the reference export, export_onnx.py:110-117) — unlike the
    static-budget StableHLO artifact, no padding or bucketing needed."""
    config = tiny_config()
    _, params = _make(config)
    sess = OnnxRuntime(export_generator_onnx(params, config), seed=0)
    scales = np.array([0.0, 1.0], np.float32)
    for b, t in ((1, 5), (3, 13)):
        x, x_lengths = _batch(config, b=b, t_x=t, seed=b)
        mel, mel_lengths = sess.run(
            None, {"input": x, "input_lengths": x_lengths, "scales": scales}
        )
        assert mel.shape[0] == b and mel.shape[1] == config.audio.mel_channels
        assert mel.shape[2] == int(np.max(mel_lengths))
        assert np.isfinite(mel).all()

    # batch-of-one slices equal the batched run (mask correctness)
    x, x_lengths = _batch(config, b=3, t_x=13, seed=3)
    mel_b, len_b = sess.run(
        None, {"input": x, "input_lengths": x_lengths, "scales": scales}
    )
    for i in range(3):
        n_x = int(x_lengths[i])
        mel_i, len_i = sess.run(
            None,
            {
                "input": x[i : i + 1, :n_x],
                "input_lengths": x_lengths[i : i + 1],
                "scales": scales,
            },
        )
        assert int(len_i[0]) == int(len_b[i])
        np.testing.assert_allclose(
            mel_i[0], mel_b[i, :, : int(len_b[i])], rtol=1e-4, atol=1e-5
        )


def test_export_cli_writes_and_infer_cli_runs(tmp_path, capsys, monkeypatch):
    """--format onnx emits a true generator.onnx from a saved checkpoint and
    the infer-export CLI streams through it (native runtime fallback when
    onnxruntime is absent) — the reference's export_onnx → infer_onnx loop."""
    import io
    import json

    from glow_tts_train_tpu import export as export_cli
    from glow_tts_train_tpu import infer_export
    from glow_tts_train_tpu.checkpoint import Checkpoint, save_checkpoint

    config = tiny_config()
    hp, params = _make(config)
    ckpt_path = tmp_path / "ckpt.npz"
    save_checkpoint(
        Checkpoint(params=params, learning_rate=1.0, global_step=1, version=1),
        ckpt_path,
    )
    config_path = tmp_path / "config.json"
    with open(config_path, "w") as f:
        config.save(f)

    out_dir = tmp_path / "onnx_out"
    export_cli.main(
        [
            str(ckpt_path),
            str(out_dir),
            "--config",
            str(config_path),
            "--format",
            "onnx",
        ]
    )
    assert (out_dir / "generator.onnx").exists()
    meta = json.loads((out_dir / "export_meta.json").read_text())
    assert meta["format"] == "onnx"

    monkeypatch.setattr("sys.stdin", io.StringIO("3 7 12 5 9 14 2\n"))
    infer_export.run(out_dir, noise_scale=0.0)
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 1
    mel = np.asarray(json.loads(lines[0])["mel"])
    assert mel.shape[0] == config.audio.mel_channels
    assert mel.shape[1] > 0 and np.isfinite(mel).all()

    # a direct path to the .onnx file works too (reference CLI contract:
    # `glow-tts-infer-onnx <model.onnx>`, infer_onnx.py:24)
    monkeypatch.setattr("sys.stdin", io.StringIO("3 7 12 5 9\n"))
    infer_export.run(out_dir / "generator.onnx", noise_scale=0.0)
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 1
    mel = np.asarray(json.loads(lines[0])["mel"])
    assert mel.shape[0] == config.audio.mel_channels


def test_onnxruntime_executes_where_installed():
    """Where a real onnxruntime wheel exists, the artifact must load and
    match the native executor (auto-lights-up coverage; skipped here)."""
    ort = pytest.importorskip("onnxruntime")

    config = tiny_config()
    _, params = _make(config)
    blob = export_generator_onnx(params, config)
    x, x_lengths = _batch(config)
    feeds = {
        "input": x,
        "input_lengths": x_lengths,
        "scales": np.array([0.0, 1.0], np.float32),
    }
    sess = ort.InferenceSession(blob)
    mel, mel_lengths = sess.run(None, feeds)[:2]
    mel_n, len_n = OnnxRuntime(blob).run(None, feeds)
    assert list(mel_lengths) == list(len_n)
    np.testing.assert_allclose(mel, mel_n, rtol=1e-4, atol=1e-4)
