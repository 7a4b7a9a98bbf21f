"""Tests for the pure-numpy ONNX executor (glow_tts_train_tpu.onnx.runtime).

Each op the Glow-TTS exporter emits is exercised against a direct numpy
computation, plus dynamic-shape graphs (runtime Shape arithmetic feeding
Pad/Slice/Reshape — the machinery the rel-pos attention export relies on).
Capability parity target: onnxruntime.InferenceSession semantics
(reference infer_onnx.py:67-75).
"""

import numpy as np
import pytest

from glow_tts_train_tpu.onnx import GraphBuilder, OnnxRuntime, proto


def run_graph(build_fn, feeds, n_outputs=1, seed=None):
    g = GraphBuilder("t")
    build_fn(g)
    sess = OnnxRuntime(g.model_bytes(), seed=seed)
    outs = sess.run(None, feeds)
    return outs[0] if n_outputs == 1 else outs


def test_conv1d_padding_dilation():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 11)).astype(np.float32)
    w = rng.standard_normal((5, 3, 4)).astype(np.float32)  # [c_out, c_in, k]
    b = rng.standard_normal(5).astype(np.float32)
    for dilation in (1, 2):
        pad = (4 - 1) * dilation // 2

        def build(g):
            xi = g.input("x", proto.FLOAT, ["b", 3, "t"])
            y = g.node(
                "Conv",
                [xi, g.init("w", w), g.init("b", b)],
                dilations=[dilation],
                pads=[pad, pad],
                kernel_shape=[4],
            )
            g.output(y, proto.FLOAT, ["b", 5, "t2"])

        got = run_graph(build, {"x": x})
        # direct: sum of shifted matmuls
        xp = np.pad(x, ((0, 0), (0, 0), (pad, pad)))
        t_out = xp.shape[2] - (4 - 1) * dilation
        want = np.zeros((2, 5, t_out), np.float32)
        for tap in range(4):
            s = tap * dilation
            want += np.einsum("nct,oc->not", xp[:, :, s : s + t_out], w[:, :, tap])
        want += b.reshape(1, 5, 1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_matmul_broadcast_and_softmax():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((2, 3, 5, 4)).astype(np.float32)
    k = rng.standard_normal((2, 3, 5, 4)).astype(np.float32)

    def build(g):
        qi = g.input("q", proto.FLOAT, ["b", 3, "t", 4])
        ki = g.input("k", proto.FLOAT, ["b", 3, "t", 4])
        kt = g.node("Transpose", [ki], perm=[0, 1, 3, 2])
        s = g.node("MatMul", [qi, kt])
        p = g.node("Softmax", [s], axis=3)
        g.output(p, proto.FLOAT, ["b", 3, "t", "t"])

    got = run_graph(build, {"q": q, "k": k})
    s = q @ k.transpose(0, 1, 3, 2)
    e = np.exp(s - s.max(-1, keepdims=True))
    want = e / e.sum(-1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_dynamic_shape_pad_slice_reshape():
    """The rel->abs index trick shape: pad last axis by (l-1) computed at
    runtime from Shape, reshape with a runtime shape tensor, slice."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 7)).astype(np.float32)  # l=4, 2l-1=7

    def build(g):
        xi = g.input("x", proto.FLOAT, ["b", "l", "m"])
        shp = g.node("Shape", [xi])
        b = g.node("Gather", [shp, g.i64_scalar(0)], axis=0)
        l = g.node("Gather", [shp, g.i64_scalar(1)], axis=0)
        lm1 = g.node("Sub", [l, g.i64_scalar(1)])
        # pad last axis right by l-1 (runtime pads tensor, rank*2 = 6)
        zeros4 = g.i64([0, 0, 0, 0, 0])
        pads = g.node(
            "Concat",
            [zeros4, g.node("Unsqueeze", [lm1], axes=[0])],
            axis=0,
        )
        padded = g.node("Pad", [xi, pads])  # [b, l, m + l - 1]
        # reshape to [b, l * (m + l - 1)]
        flat_shape = g.node(
            "Concat",
            [
                g.node("Unsqueeze", [b], axes=[0]),
                g.i64([-1]),
            ],
            axis=0,
        )
        flat = g.node("Reshape", [padded, flat_shape])
        # slice [:, 2:6]
        sl = g.node(
            "Slice", [flat, g.i64([2]), g.i64([6]), g.i64([1])]
        )
        g.output(sl, proto.FLOAT, ["b", 4])

    got = run_graph(build, {"x": x})
    padded = np.pad(x, ((0, 0), (0, 0), (0, 3)))
    want = padded.reshape(2, -1)[:, 2:6]
    np.testing.assert_allclose(got, want)


def test_gather_embedding_and_cast():
    emb = np.arange(20, dtype=np.float32).reshape(5, 4)
    ids = np.array([[0, 4, 2], [1, 1, 3]], np.int64)

    def build(g):
        xi = g.input("ids", proto.INT64, ["b", "t"])
        e = g.node("Gather", [g.init("emb", emb), xi], axis=0)
        c = g.node("Cast", [e], to=proto.DOUBLE)
        g.output(c, proto.DOUBLE, ["b", "t", 4])

    got = run_graph(build, {"ids": ids})
    assert got.dtype == np.float64
    np.testing.assert_array_equal(got, emb[ids])


def test_reduce_where_clip_cumsum_range():
    x = np.array([[1.0, -2.0, 3.0], [0.5, 0.0, -1.0]], np.float32)

    def build(g):
        xi = g.input("x", proto.FLOAT, ["b", 3])
        s = g.node("ReduceSum", [xi], axes=[1], keepdims=0)
        m = g.node("ReduceMax", [xi], axes=[1], keepdims=1)
        w = g.node(
            "Where",
            [
                g.node("Greater", [xi, g.f32_scalar(0.0)]),
                xi,
                g.node("Neg", [xi]),
            ],
        )
        cl = g.node("Clip", [xi, g.f32_scalar(0.0), g.f32_scalar(1.0)])
        cs = g.node("CumSum", [xi, g.i64_scalar(1)])
        r = g.node(
            "Range",
            [g.i64_scalar(0), g.i64_scalar(5), g.i64_scalar(1)],
        )
        for name, val, shape in (
            ("s", s, ["b"]),
            ("m", m, ["b", 1]),
            ("w", w, ["b", 3]),
            ("cl", cl, ["b", 3]),
            ("cs", cs, ["b", 3]),
        ):
            g.node("Identity", [val], outputs=[name])
            g.output(name, proto.FLOAT, shape)
        g.node("Identity", [r], outputs=["r"])
        g.output("r", proto.INT64, [5])

    outs = run_graph(build, {"x": x}, n_outputs=6)
    s, m, w, cl, cs, r = outs
    np.testing.assert_allclose(s, x.sum(1))
    np.testing.assert_allclose(m, x.max(1, keepdims=True))
    np.testing.assert_allclose(w, np.abs(x))
    np.testing.assert_allclose(cl, np.clip(x, 0, 1))
    np.testing.assert_allclose(cs, np.cumsum(x, 1))
    np.testing.assert_array_equal(r, np.arange(5))


def test_split_and_concat():
    x = np.arange(24, dtype=np.float32).reshape(2, 6, 2)

    def build(g):
        xi = g.input("x", proto.FLOAT, ["b", 6, 2])
        a, b = g.node("Split", [xi], n_outputs=2, axis=1, split=[3, 3])
        y = g.node("Concat", [b, a], axis=1)
        g.output(y, proto.FLOAT, ["b", 6, 2])

    got = run_graph(build, {"x": x})
    want = np.concatenate([x[:, 3:], x[:, :3]], axis=1)
    np.testing.assert_array_equal(got, want)


def test_random_normal_like_seeded():
    x = np.zeros((3, 4), np.float32)

    def build(g):
        xi = g.input("x", proto.FLOAT, ["a", "b"])
        r = g.node("RandomNormalLike", [xi])
        g.output(r, proto.FLOAT, ["a", "b"])

    a = run_graph(build, {"x": x}, seed=7)
    b = run_graph(build, {"x": x}, seed=7)
    c = run_graph(build, {"x": x}, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)
    assert a.shape == x.shape and a.dtype == np.float32


def test_layer_norm_decomposition():
    """The exporter's channel-dim LayerNorm (ReduceMean/Sub/Sqrt/Div) against
    the framework's own layer_norm (eps=1e-4, reference layers.py:10-28)."""
    from glow_tts_train_tpu.ops.norms import layer_norm

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 7)).astype(np.float32)  # [b, c, t]
    gamma = rng.standard_normal(5).astype(np.float32)
    beta = rng.standard_normal(5).astype(np.float32)

    def build(g):
        xi = g.input("x", proto.FLOAT, ["b", 5, "t"])
        mean = g.node("ReduceMean", [xi], axes=[1], keepdims=1)
        d = g.node("Sub", [xi, mean])
        var = g.node(
            "ReduceMean", [g.node("Mul", [d, d])], axes=[1], keepdims=1
        )
        denom = g.node(
            "Sqrt", [g.node("Add", [var, g.f32_scalar(1e-4)])]
        )
        y = g.node("Div", [d, denom])
        y = g.node("Mul", [y, g.init("gamma", gamma.reshape(1, 5, 1))])
        y = g.node("Add", [y, g.init("beta", beta.reshape(1, 5, 1))])
        g.output(y, proto.FLOAT, ["b", 5, "t"])

    got = run_graph(build, {"x": x})
    # framework op is channels-last
    want = layer_norm(
        np.transpose(x, (0, 2, 1)), {"gamma": gamma, "beta": beta}
    )
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 1)), rtol=1e-5, atol=1e-5)


def test_missing_input_raises():
    def build(g):
        xi = g.input("x", proto.FLOAT, [1])
        g.output(g.node("Relu", [xi]), proto.FLOAT, [1])

    g = GraphBuilder("t")
    build(g)
    sess = OnnxRuntime(g.model_bytes())
    with pytest.raises(ValueError, match="missing graph inputs"):
        sess.run(None, {})


def test_grouped_conv():
    """group>1 slices input channels by w.shape[1] (the per-group width),
    not the full c_in."""
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 4, 9)).astype(np.float32)
    w = rng.standard_normal((6, 2, 3)).astype(np.float32)  # group=2: c_in/g=2

    def build(g):
        xi = g.input("x", proto.FLOAT, ["b", 4, "t"])
        y = g.node("Conv", [xi, g.init("w", w)], group=2, pads=[1, 1])
        g.output(y, proto.FLOAT, ["b", 6, "t"])

    got = run_graph(build, {"x": x})
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1)))
    want = np.zeros((2, 6, 9), np.float32)
    for gi in range(2):
        xg = xp[:, gi * 2 : (gi + 1) * 2]
        wg = w[gi * 3 : (gi + 1) * 3]
        for tap in range(3):
            want[:, gi * 3 : (gi + 1) * 3] += np.einsum(
                "nct,oc->not", xg[:, :, tap : tap + 9], wg[:, :, tap]
            )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv_same_upper_strided():
    """SAME_UPPER total padding includes the stride term:
    (ceil(t/s)-1)*s + (k-1)*d + 1 - t, not just (k-1)*d."""
    x = np.arange(8, dtype=np.float32).reshape(1, 1, 8)
    w = np.ones((1, 1, 3), np.float32)

    def build(g):
        xi = g.input("x", proto.FLOAT, [1, 1, "t"])
        y = g.node("Conv", [xi, g.init("w", w)], strides=[2], auto_pad="SAME_UPPER")
        g.output(y, proto.FLOAT, [1, 1, "t2"])

    got = run_graph(build, {"x": x})
    # t=8, s=2 -> out 4; total pad = 3*2 + 3 - 8 = 1 -> (0, 1)
    xp = np.pad(x, ((0, 0), (0, 0), (0, 1)))
    want = np.stack(
        [xp[0, 0, s : s + 3].sum() for s in range(0, 8, 2)]
    ).reshape(1, 1, 4)
    np.testing.assert_allclose(got, want)


def test_unsqueeze_multiple_negative_axes():
    """Negative Unsqueeze axes resolve against the OUTPUT rank: axes=[-2,-1]
    on a [3] tensor gives [3,1,1] (onnxruntime semantics), not [1,3,1]."""
    x = np.array([1.0, 2.0, 3.0], np.float32)

    def build(g):
        xi = g.input("x", proto.FLOAT, [3])
        y = g.node("Unsqueeze", [xi], axes=[-2, -1])
        g.output(y, proto.FLOAT, [3, 1, 1])

    got = run_graph(build, {"x": x})
    assert got.shape == (3, 1, 1)
    np.testing.assert_array_equal(got.reshape(3), x)


def test_softmax_opset13_per_axis():
    """opset>=13 Softmax normalizes the named axis only; opset<13 flattens
    the suffix at the axis.  Both semantics pinned on the same graph."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)

    def graph_bytes(opset):
        g = GraphBuilder("t")
        xi = g.input("x", proto.FLOAT, ["b", 3, 4])
        g.output(g.node("Softmax", [xi], axis=1), proto.FLOAT, ["b", 3, 4])
        return g.model_bytes(opset_version=opset)

    got13 = OnnxRuntime(graph_bytes(13)).run(None, {"x": x})[0]
    e = np.exp(x - x.max(1, keepdims=True))
    np.testing.assert_allclose(got13, e / e.sum(1, keepdims=True), rtol=1e-5)

    got12 = OnnxRuntime(graph_bytes(12)).run(None, {"x": x})[0]
    x2 = x.reshape(2, 12)
    e2 = np.exp(x2 - x2.max(1, keepdims=True))
    want12 = (e2 / e2.sum(1, keepdims=True)).reshape(2, 3, 4)
    np.testing.assert_allclose(got12, want12, rtol=1e-5)


def test_integer_div_truncates_toward_zero():
    a = np.array([-7, 7, -7, 6], np.int64)
    b = np.array([2, 2, -2, -4], np.int64)

    def build(g):
        ai = g.input("a", proto.INT64, [4])
        bi = g.input("b", proto.INT64, [4])
        g.output(g.node("Div", [ai, bi]), proto.INT64, [4])

    got = run_graph(build, {"a": a, "b": b})
    np.testing.assert_array_equal(got, np.array([-3, 3, 3, -1]))
    assert got.dtype == np.int64


def test_unsupported_op_raises():
    g = GraphBuilder("t")
    xi = g.input("x", proto.FLOAT, [1])
    g.output(g.node("NonexistentOp999", [xi]), proto.FLOAT, [1])
    sess = OnnxRuntime(g.model_bytes())
    with pytest.raises(NotImplementedError):
        sess.run(None, {"x": np.zeros(1, np.float32)})
