"""Golden tests for the minimal ONNX protobuf wire-format reader.

Encodes synthetic ModelProto blobs byte-by-byte (the encoder below is the
wire-format spec in executable form) and asserts the reader recovers the
tensors/nodes exactly — raw_data and typed-data paths, packed and unpacked
dims, fp16/int64 dtypes, and Conv+BatchNormalization folding.
"""
import numpy as np
import pytest

from mmgt_tpu.utils import onnx_reader as orx


# ------------------------------------------------------- tiny proto encoder
def _varint(v: int) -> bytes:
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _tag(field: int, wt: int) -> bytes:
    return _varint(field << 3 | wt)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _tensor(name, arr, use_raw=True, packed_dims=True):
    out = b""
    dims = arr.shape
    if packed_dims:
        out += _len_field(1, b"".join(_varint(d) for d in dims))
    else:
        out += b"".join(_tag(1, 0) + _varint(d) for d in dims)
    code = {
        np.dtype("float32"): 1, np.dtype("float16"): 10,
        np.dtype("int64"): 7, np.dtype("int32"): 6,
    }[arr.dtype]
    out += _tag(2, 0) + _varint(code)
    out += _len_field(8, name.encode())
    if use_raw:
        out += _len_field(9, arr.tobytes())
    elif arr.dtype == np.float32:
        out += _len_field(4, arr.astype("<f4").tobytes())  # packed float_data
    elif arr.dtype == np.int64:
        vals = b"".join(_varint(int(v) & (2**64 - 1)) for v in arr.ravel())
        out += _len_field(7, vals)
    return out


def _node(op_type, inputs, outputs, name=""):
    out = b"".join(_len_field(1, i.encode()) for i in inputs)
    out += b"".join(_len_field(2, o.encode()) for o in outputs)
    out += _len_field(3, name.encode())
    out += _len_field(4, op_type.encode())
    return out


def _model(tensors=(), nodes=()):
    graph = b"".join(_len_field(1, n) for n in nodes)
    graph += b"".join(_len_field(5, t) for t in tensors)
    # ir_version (field 1) + graph (field 7)
    return _tag(1, 0) + _varint(8) + _len_field(7, graph)


# ------------------------------------------------------------------- tests
def test_raw_data_tensor():
    w = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    inits, nodes = orx.parse_onnx_graph(_model([_tensor("w", w)]))
    np.testing.assert_array_equal(inits["w"], w)
    assert nodes == []


def test_typed_data_and_unpacked_dims():
    f = np.linspace(-1, 1, 6, dtype=np.float32).reshape(2, 3)
    i = np.array([-3, 5, 2**40], dtype=np.int64)
    blob = _model([
        _tensor("f", f, use_raw=False, packed_dims=False),
        _tensor("i", i, use_raw=False),
    ])
    inits, _ = orx.parse_onnx_graph(blob)
    np.testing.assert_allclose(inits["f"], f)
    np.testing.assert_array_equal(inits["i"], i)


def test_fp16_raw():
    h = np.array([[0.5, -2.0], [1.25, 3.0]], dtype=np.float16)
    inits, _ = orx.parse_onnx_graph(_model([_tensor("h", h)]))
    assert inits["h"].dtype == np.float16
    np.testing.assert_array_equal(inits["h"], h)


def test_nodes_parsed():
    blob = _model(
        nodes=[_node("Conv", ["x", "w", "b"], ["y"], name="conv0")]
    )
    _, nodes = orx.parse_onnx_graph(blob)
    assert nodes == [
        {"input": ["x", "w", "b"], "output": ["y"], "name": "conv0",
         "op_type": "Conv", "attrs": {}}
    ]


def test_not_a_model():
    with pytest.raises(ValueError):
        orx.parse_onnx_graph(_tag(1, 0) + _varint(3))


def test_fold_batchnorms_matches_reference_math():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)  # OIHW
    scale = rng.uniform(0.5, 2, 4).astype(np.float32)
    bias = rng.standard_normal(4).astype(np.float32)
    mean = rng.standard_normal(4).astype(np.float32)
    var = rng.uniform(0.5, 2, 4).astype(np.float32)
    eps = 1e-5

    tensors = [
        _tensor("conv.w", w),
        _tensor("bn.s", scale), _tensor("bn.b", bias),
        _tensor("bn.m", mean), _tensor("bn.v", var),
    ]
    nodes = [
        _node("Conv", ["x", "conv.w"], ["c_out"]),
        _node("BatchNormalization", ["c_out", "bn.s", "bn.b", "bn.m", "bn.v"],
              ["y"]),
    ]
    inits, parsed_nodes = orx.parse_onnx_graph(_model(tensors, nodes))
    folded = orx.fold_batchnorms(inits, parsed_nodes, eps=eps)

    inv = scale / np.sqrt(var + eps)
    np.testing.assert_allclose(
        folded["conv.w"], w * inv[:, None, None, None], rtol=1e-6
    )
    np.testing.assert_allclose(
        folded["conv.w.folded_bias"], -mean * inv + bias, rtol=1e-6
    )
    for k in ("bn.s", "bn.b", "bn.m", "bn.v"):
        assert k not in folded

    # numerically: conv(x; w_folded) + b_folded == bn(conv(x; w))
    x = rng.standard_normal((1, 3, 5, 5)).astype(np.float32)
    import jax.numpy as jnp
    from jax import lax

    def conv(x, w):
        return lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    y_bn = (np.asarray(conv(x, w)) - mean[:, None, None]) / np.sqrt(
        var[:, None, None] + eps
    ) * scale[:, None, None] + bias[:, None, None]
    y_folded = np.asarray(conv(x, folded["conv.w"])) + folded[
        "conv.w.folded_bias"
    ][:, None, None]
    np.testing.assert_allclose(y_folded, y_bn, atol=1e-4)
