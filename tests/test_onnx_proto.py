"""Wire-format tests for the hand-rolled ONNX protobuf codec.

Two independent checks:
1. roundtrip — encode with glow_tts_train_tpu.onnx.proto, decode with its
   own parser, compare structurally.
2. cross-validation against google.protobuf — a minimal schema with the
   same (frozen, published) onnx.proto field numbers is compiled with
   protoc into a descriptor set and loaded via message_factory; our bytes
   must parse correctly under google's wire codec and vice versa.  This
   catches varint/tag/length/packing bugs with a genuinely independent
   implementation (the field numbers themselves are pinned in both from
   the published schema).

The reference's ONNX artifacts come from torch.onnx.export
(reference export_onnx.py:105-118); this codec is what lets the framework
emit the same format with no torch/onnx dependency.
"""

import shutil
import subprocess
import typing

import numpy as np
import pytest

from glow_tts_train_tpu.onnx import builder, proto

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def tiny_model_bytes() -> bytes:
    """A small but representative model: every encoder feature is used."""
    g = builder.GraphBuilder("tiny")
    x = g.input("x", proto.FLOAT, ["batch", 3, "t"])
    w = g.init("w", np.arange(12, dtype=np.float32).reshape(4, 3, 1))
    b = g.init("b", np.array([0.0, -1.0, 2.5, 3.0], np.float32))
    y = g.node("Conv", [x, w, b], kernel_shape=[1], pads=[0, 0])
    y = g.node("Relu", [y])
    shp = g.i64([0, -1])
    y2 = g.node("Reshape", [y, shp])
    sm = g.node("Softmax", [y2], axis=1)
    g.output(sm, proto.FLOAT, ["batch", None])
    g.node(
        "Pad",
        [x, g.i64([0, 0, 1, 0, 0, 2]), g.f32_scalar(-1.5)],
        outputs=["padded"],
        mode="constant",
    )
    g.output("padded", proto.FLOAT, ["batch", 3, "t2"])
    return g.model_bytes(
        opset_version=12, producer_version="0.0-test", doc_string="doc here"
    )


# ---------------------------------------------------------------------------
# 1. self roundtrip
# ---------------------------------------------------------------------------


def test_roundtrip_structure():
    data = tiny_model_bytes()
    m = proto.decode_model(data)
    assert m.ir_version == 7
    assert m.opset_version == 12
    assert m.producer_name == "glow-tts-train-tpu"
    assert m.doc_string == "doc here"
    gr = m.graph
    assert gr.name == "tiny"
    assert [n.op_type for n in gr.nodes] == [
        "Conv",
        "Relu",
        "Reshape",
        "Softmax",
        "Pad",
    ]
    conv = gr.nodes[0]
    assert conv.attributes["kernel_shape"] == [1]
    assert conv.attributes["pads"] == [0, 0]
    sm = gr.nodes[3]
    assert sm.attributes["axis"] == 1
    pad = gr.nodes[4]
    assert pad.attributes["mode"] == "constant"
    assert pad.outputs == ["padded"]
    # initializers roundtrip bit-exactly
    by_name = {t.name: t.array for t in gr.initializers}
    w = by_name["w_1"]
    assert w.shape == (4, 3, 1) and w.dtype == np.float32
    np.testing.assert_array_equal(w, np.arange(12, dtype=np.float32).reshape(4, 3, 1))
    # value infos: symbolic + fixed + anonymous dims
    assert gr.inputs[0].shape == ["batch", 3, "t"]
    assert gr.outputs[0].shape == ["batch", None]


def test_tensor_dtypes_roundtrip():
    for arr in (
        np.array([[1, -2], [3, 4]], np.int64),
        np.array([1.5, -2.25], np.float32),
        np.array([True, False, True]),
        np.array(7, np.int32),  # scalar
        np.zeros((0, 3), np.float32),  # empty
        np.array([1.0, 2.0], np.float64),
        np.array([255, 0], np.uint8),
    ):
        t = proto.decode_tensor(proto.encode_tensor("t", arr))
        assert t.name == "t"
        assert t.array.dtype == arr.dtype
        assert t.array.shape == arr.shape
        np.testing.assert_array_equal(t.array, arr)


def test_negative_int_attributes():
    node = proto.decode_node(
        proto.encode_node("Slice", ["x"], ["y"], attributes={"axes": [-1, 2]})
    )
    assert node.attributes["axes"] == [-1, 2]
    a = proto.decode_attribute(proto.encode_attribute("i", -5))
    assert a.value == -5


# ---------------------------------------------------------------------------
# 2. cross-validation against google.protobuf
# ---------------------------------------------------------------------------

_ONNX_SUBSET_PROTO = """
syntax = "proto3";
package onnx_xcheck;

message TensorProto {
  repeated int64 dims = 1;
  int32 data_type = 2;
  repeated float float_data = 4;
  repeated int32 int32_data = 5;
  repeated int64 int64_data = 7;
  string name = 8;
  bytes raw_data = 9;
  repeated double double_data = 10;
}
message AttributeProto {
  string name = 1;
  float f = 2;
  int64 i = 3;
  bytes s = 4;
  TensorProto t = 5;
  repeated float floats = 7;
  repeated int64 ints = 8;
  repeated bytes strings = 9;
  int32 type = 20;
}
message ValueInfoProto { string name = 1; TypeProto type = 2; }
message TypeProto {
  message Tensor { int32 elem_type = 1; TensorShapeProto shape = 2; }
  Tensor tensor_type = 1;
}
message TensorShapeProto {
  message Dimension { oneof value { int64 dim_value = 1; string dim_param = 2; } }
  repeated Dimension dim = 1;
}
message NodeProto {
  repeated string input = 1;
  repeated string output = 2;
  string name = 3;
  string op_type = 4;
  repeated AttributeProto attribute = 5;
  string domain = 7;
}
message GraphProto {
  repeated NodeProto node = 1;
  string name = 2;
  repeated TensorProto initializer = 5;
  string doc_string = 10;
  repeated ValueInfoProto input = 11;
  repeated ValueInfoProto output = 12;
}
message OperatorSetIdProto { string domain = 1; int64 version = 2; }
message ModelProto {
  int64 ir_version = 1;
  string producer_name = 2;
  string producer_version = 3;
  string doc_string = 6;
  GraphProto graph = 7;
  repeated OperatorSetIdProto opset_import = 8;
}
"""


def _google_message_classes(tmp_path) -> typing.Optional[dict]:
    """protoc-compile the subset schema and load it via message_factory."""
    if shutil.which("protoc") is None:
        return None
    try:
        from google.protobuf import descriptor_pb2, descriptor_pool
        from google.protobuf import message_factory
    except ImportError:
        return None
    src = tmp_path / "onnx_xcheck.proto"
    src.write_text(_ONNX_SUBSET_PROTO)
    out = tmp_path / "onnx_xcheck.desc"
    res = subprocess.run(
        [
            "protoc",
            f"--proto_path={tmp_path}",
            f"--descriptor_set_out={out}",
            str(src),
        ],
        capture_output=True,
        text=True,
    )
    if res.returncode != 0:
        return None
    fds = descriptor_pb2.FileDescriptorSet()
    fds.ParseFromString(out.read_bytes())
    pool = descriptor_pool.DescriptorPool()
    for f in fds.file:
        pool.Add(f)
    names = [
        "ModelProto",
        "GraphProto",
        "NodeProto",
        "TensorProto",
        "AttributeProto",
        "ValueInfoProto",
    ]
    get = getattr(message_factory, "GetMessageClass", None)
    classes = {}
    for n in names:
        desc = pool.FindMessageTypeByName(f"onnx_xcheck.{n}")
        if get is not None:
            classes[n] = get(desc)
        else:  # older protobuf
            classes[n] = message_factory.MessageFactory(pool).GetPrototype(desc)
    return classes


@pytest.fixture(scope="module")
def google_classes(tmp_path_factory):
    classes = _google_message_classes(tmp_path_factory.mktemp("protoc"))
    if classes is None:
        pytest.skip("protoc/google.protobuf unavailable")
    return classes


def test_google_parses_our_bytes(google_classes):
    data = tiny_model_bytes()
    m = google_classes["ModelProto"]()
    m.ParseFromString(data)
    assert m.ir_version == 7
    assert m.producer_name == "glow-tts-train-tpu"
    assert m.producer_version == "0.0-test"
    assert m.opset_import[0].version == 12
    assert m.graph.name == "tiny"
    assert [n.op_type for n in m.graph.node] == [
        "Conv",
        "Relu",
        "Reshape",
        "Softmax",
        "Pad",
    ]
    conv = m.graph.node[0]
    attrs = {a.name: a for a in conv.attribute}
    assert list(attrs["kernel_shape"].ints) == [1]
    assert attrs["kernel_shape"].type == proto.ATTR_INTS
    sm_attrs = {a.name: a for a in m.graph.node[3].attribute}
    assert sm_attrs["axis"].i == 1
    # initializer raw bytes identical under google's decoder
    inits = {t.name: t for t in m.graph.initializer}
    w = inits["w_1"]
    assert list(w.dims) == [4, 3, 1]
    assert w.data_type == proto.FLOAT
    np.testing.assert_array_equal(
        np.frombuffer(w.raw_data, "<f4"), np.arange(12, dtype=np.float32)
    )
    # value-info dims: symbolic and fixed
    dims = m.graph.input[0].type.tensor_type.shape.dim
    assert dims[0].dim_param == "batch"
    assert dims[1].dim_value == 3
    assert dims[2].dim_param == "t"


def test_we_parse_google_bytes(google_classes):
    """Encode with google.protobuf (incl. packed repeated ints), decode with
    our parser."""
    ModelProto = google_classes["ModelProto"]
    m = ModelProto()
    m.ir_version = 7
    m.producer_name = "google-side"
    op = m.opset_import.add()
    op.version = 12
    g = m.graph
    g.name = "gg"
    n = g.node.add()
    n.op_type = "Slice"
    n.input.extend(["x", "starts"])
    n.output.append("y")
    a = n.attribute.add()
    a.name = "axes"
    a.ints.extend([-1, 0, 3])  # proto3 packs these on the wire
    a.type = proto.ATTR_INTS
    af = n.attribute.add()
    af.name = "alpha"
    af.f = 0.25
    af.type = proto.ATTR_FLOAT
    t = g.initializer.add()
    t.name = "starts"
    t.dims.extend([2])
    t.data_type = proto.INT64
    t.raw_data = np.array([5, -7], "<i8").tobytes()
    vi = g.input.add()
    vi.name = "x"
    vi.type.tensor_type.elem_type = proto.FLOAT
    d0 = vi.type.tensor_type.shape.dim.add()
    d0.dim_param = "batch"
    d1 = vi.type.tensor_type.shape.dim.add()
    d1.dim_value = 4

    ours = proto.decode_model(m.SerializeToString())
    assert ours.ir_version == 7
    assert ours.producer_name == "google-side"
    assert ours.opset_version == 12
    node = ours.graph.nodes[0]
    assert node.op_type == "Slice"
    assert node.inputs == ["x", "starts"]
    assert node.attributes["axes"] == [-1, 0, 3]  # packed varints + signs
    assert node.attributes["alpha"] == pytest.approx(0.25)
    init = ours.graph.initializers[0]
    np.testing.assert_array_equal(init.array, np.array([5, -7], np.int64))
    assert ours.graph.inputs[0].shape == ["batch", 4]
