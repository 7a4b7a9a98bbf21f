"""Cross-runtime triangulation of the native ONNX stack (VERDICT r4 #3).

Both the ONNX producer (onnx/export.py) and its in-house consumer
(onnx/runtime.py) are first-party, so a correlated op-semantics bug could
pass every producer↔consumer parity test.  The reference gets its
independent-consumer property from onnxruntime
(/root/reference/glow_tts_train/infer_onnx.py:67-75); no onnxruntime
wheel exists in this image, but stock TensorFlow does.  This test
triangulates the SAME checkpoint through three runtimes nobody shares
op implementations with each other on:

  1. live JAX (`build_infer_fn` — the exported graph, pre-serialization),
  2. a TensorFlow SavedModel round-trip (jax2tf → tf.saved_model.save →
     fresh tf.saved_model.load → serving_default under stock TF),
  3. generator.onnx under the first-party numpy executor.

All pairs must agree to ≤1e-4 at noise=0.  If the exporter and the numpy
executor shared a wrong convention (a pad, a slice, an axis order), leg 3
would split from legs 1–2.  A dynamic-batch leg (b=2, ragged lengths)
covers the dynamic axes the TF signature (fixed [1, T]) cannot.

The onnxruntime-conditional test in test_onnx_export.py remains for
images that do carry the wheel.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glow_tts_train_tpu.export import build_infer_fn, export_savedmodel
from glow_tts_train_tpu.models import (
    forward_gen,
    hyper_from_config,
    init_model,
    store_inverse,
)
from glow_tts_train_tpu.onnx import OnnxRuntime
from glow_tts_train_tpu.onnx.export import export_generator_onnx

from helpers import tiny_config

tf = pytest.importorskip("tensorflow")

MAX_TEXT = 16
MAX_FRAMES = 64


def _fixture(seed=0):
    config = tiny_config()
    hp = hyper_from_config(config)
    params = store_inverse(init_model(jax.random.PRNGKey(seed), hp))
    rng = np.random.default_rng(seed)
    t_real = 9
    x = np.zeros((1, MAX_TEXT), np.int32)
    x[0, :t_real] = rng.integers(1, config.model.num_symbols, size=t_real)
    x_lengths = np.array([t_real], np.int32)
    return config, hp, params, x, x_lengths


def test_three_runtimes_agree(tmp_path):
    config, hp, params, x, x_lengths = _fixture()
    scales = np.array([0.0, 1.0], np.float32)  # noise=0: fully deterministic

    # leg 1: live JAX, the exact graph every export serializes
    infer_fn = jax.jit(build_infer_fn(params, config, MAX_FRAMES))
    mel_jax, len_jax = infer_fn(
        jnp.asarray(x), jnp.asarray(x_lengths), jnp.asarray(scales),
        jnp.int32(0),
    )
    mel_jax, len_jax = np.asarray(mel_jax), np.asarray(len_jax)
    n = int(len_jax[0])
    assert 0 < n <= MAX_FRAMES

    # leg 2: SavedModel round-trip under stock TF
    sm_dir = tmp_path / "savedmodel"
    export_savedmodel(params, config, MAX_TEXT, MAX_FRAMES, sm_dir)
    loaded = tf.saved_model.load(str(sm_dir))
    serving = loaded.signatures["serving_default"]
    tf_out = serving(
        input=tf.constant(x, tf.int32),
        input_lengths=tf.constant(x_lengths, tf.int32),
        scales=tf.constant(scales, tf.float32),
        seed=tf.constant(0, tf.int32),
    )
    # signature outputs are name-keyed; identify by dtype/rank
    tf_vals = [v.numpy() for v in tf_out.values()]
    mel_tf = next(v for v in tf_vals if v.ndim == 3)
    len_tf = next(v for v in tf_vals if v.ndim == 1)
    assert list(len_tf) == list(len_jax)
    np.testing.assert_allclose(
        mel_tf[0, :, :n], mel_jax[0, :, :n], rtol=1e-4, atol=1e-4
    )

    # leg 3: generator.onnx under the first-party numpy executor
    sess = OnnxRuntime(export_generator_onnx(params, config), seed=0)
    mel_onnx, len_onnx = sess.run(
        None,
        {
            "input": x.astype(np.int64),
            "input_lengths": x_lengths.astype(np.int64),
            "scales": scales,
        },
    )
    assert list(len_onnx) == list(len_jax)
    # the ONNX graph is dynamic: its mel width is max(mel_lengths)
    np.testing.assert_allclose(
        mel_onnx[0, :, :n], mel_jax[0, :, :n], rtol=1e-4, atol=1e-4
    )
    # the triangulating pair: two serialized artifacts, two runtimes,
    # no shared op implementations
    np.testing.assert_allclose(
        mel_onnx[0, :, :n], mel_tf[0, :, :n], rtol=1e-4, atol=1e-4
    )


def test_dynamic_batch_onnx_vs_jax():
    """b=2 with ragged lengths — the dynamic axes the fixed-[1,T] TF
    signature cannot carry; ONNX executor vs live forward_gen."""
    config, hp, params, _, _ = _fixture(seed=3)
    rng = np.random.default_rng(3)
    x = np.zeros((2, 11), np.int64)
    x_lengths = np.array([11, 6], np.int64)
    for i, ln in enumerate(x_lengths):
        x[i, :ln] = rng.integers(1, config.model.num_symbols, size=ln)

    sess = OnnxRuntime(export_generator_onnx(params, config), seed=0)
    mel, mel_lengths = sess.run(
        None,
        {
            "input": x,
            "input_lengths": x_lengths,
            "scales": np.array([0.0, 1.0], np.float32),
        },
    )

    (y, _, _, _), _, _, y_lengths = forward_gen(
        params, hp,
        jnp.asarray(x, jnp.int32), jnp.asarray(x_lengths, jnp.int32),
        y_max_length=128, noise_rng=jax.random.PRNGKey(1),
        noise_scale=0.0, length_scale=1.0,
    )
    y, y_lengths = np.asarray(y), np.asarray(y_lengths)
    assert list(mel_lengths) == list(y_lengths)
    for i in range(2):
        n = int(y_lengths[i])
        np.testing.assert_allclose(
            mel[i, :, :n], y[i, :n, :].T, rtol=1e-4, atol=2e-4
        )
