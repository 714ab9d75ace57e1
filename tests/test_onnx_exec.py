"""ONNX executor tests: synthetic graphs (hand-encoded protobuf) executed
by mmgt_tpu.utils.onnx_exec and checked against torch — an independent
reference implementation of the same ops."""
import struct

import jax.numpy as jnp
import numpy as np
import pytest

from test_onnx_reader import _len_field, _model, _tag, _tensor, _varint

from mmgt_tpu.utils.onnx_exec import OnnxRunner

torch = pytest.importorskip("torch")


# ------------------------------------------------- encoder extensions
def _attr(name, val):
    out = _len_field(1, name.encode())
    if isinstance(val, bool):
        out += _tag(3, 0) + _varint(int(val))
    elif isinstance(val, float):
        out += _tag(2, 5) + struct.pack("<f", val)
    elif isinstance(val, int):
        out += _tag(3, 0) + _varint(val & (2**64 - 1))
    elif isinstance(val, str):
        out += _len_field(4, val.encode())
    elif isinstance(val, np.ndarray):
        out += _len_field(5, _tensor("", val))
    elif isinstance(val, (list, tuple)) and all(
        isinstance(v, (int, np.integer)) for v in val
    ):
        out += _len_field(8, b"".join(_varint(int(v) & (2**64 - 1)) for v in val))
    elif isinstance(val, (list, tuple)):
        out += _len_field(7, np.asarray(val, "<f4").tobytes())
    else:
        raise TypeError(type(val))
    return out


def _node_a(op_type, inputs, outputs, attrs=None, name=""):
    out = b"".join(_len_field(1, i.encode()) for i in inputs)
    out += b"".join(_len_field(2, o.encode()) for o in outputs)
    out += _len_field(3, name.encode())
    out += _len_field(4, op_type.encode())
    for k, v in (attrs or {}).items():
        out += _len_field(5, _attr(k, v))
    return out


def _value_info(name):
    return _len_field(1, name.encode())


def _model_io(tensors, nodes, inputs, outputs):
    graph = b"".join(_len_field(1, n) for n in nodes)
    graph += b"".join(_len_field(5, t) for t in tensors)
    graph += b"".join(_len_field(11, _value_info(n)) for n in inputs)
    graph += b"".join(_len_field(12, _value_info(n)) for n in outputs)
    return _tag(1, 0) + _varint(8) + _len_field(7, graph)


def _run(blob, *arrays):
    return OnnxRunner.from_bytes(blob)(*arrays)


# --------------------------------------------------------------- tests
def test_conv_bn_relu_maxpool_gemm_vs_torch():
    """A small convnet graph end-to-end vs the equivalent torch modules."""
    rng = np.random.default_rng(0)
    w1 = rng.standard_normal((8, 3, 3, 3)).astype(np.float32) * 0.2
    b1 = rng.standard_normal(8).astype(np.float32)
    bn_s = rng.uniform(0.5, 2, 8).astype(np.float32)
    bn_b = rng.standard_normal(8).astype(np.float32)
    bn_m = rng.standard_normal(8).astype(np.float32)
    bn_v = rng.uniform(0.5, 2, 8).astype(np.float32)
    wfc = rng.standard_normal((8, 4)).astype(np.float32) * 0.3
    bfc = rng.standard_normal(4).astype(np.float32)

    tensors = [
        _tensor("w1", w1), _tensor("b1", b1),
        _tensor("bn_s", bn_s), _tensor("bn_b", bn_b),
        _tensor("bn_m", bn_m), _tensor("bn_v", bn_v),
        _tensor("wfc", wfc), _tensor("bfc", bfc),
    ]
    nodes = [
        _node_a("Conv", ["x", "w1", "b1"], ["c1"],
                {"strides": [2, 2], "pads": [1, 1, 1, 1]}),
        _node_a("BatchNormalization", ["c1", "bn_s", "bn_b", "bn_m", "bn_v"],
                ["bn"], {"epsilon": 1e-5}),
        _node_a("Relu", ["bn"], ["r"]),
        _node_a("MaxPool", ["r"], ["p"],
                {"kernel_shape": [2, 2], "strides": [2, 2]}),
        _node_a("GlobalAveragePool", ["p"], ["g"]),
        _node_a("Flatten", ["g"], ["f"], {"axis": 1}),
        _node_a("Gemm", ["f", "wfc", "bfc"], ["y"], {}),
    ]
    blob = _model_io(tensors, nodes, ["x"], ["y"])
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    out = np.asarray(_run(blob, x)["y"])

    with torch.no_grad():
        t = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w1), torch.from_numpy(b1),
            stride=2, padding=1,
        )
        t = torch.nn.functional.batch_norm(
            t, torch.from_numpy(bn_m), torch.from_numpy(bn_v),
            torch.from_numpy(bn_s), torch.from_numpy(bn_b), eps=1e-5,
        )
        t = torch.relu(t)
        t = torch.nn.functional.max_pool2d(t, 2, 2)
        t = t.mean(dim=(2, 3))
        want = (t @ torch.from_numpy(wfc) + torch.from_numpy(bfc)).numpy()
    np.testing.assert_allclose(out, want, atol=2e-5)


def test_grouped_conv_and_leaky_vs_torch():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((8, 1, 5, 5)).astype(np.float32) * 0.2  # depthwise
    x = rng.standard_normal((1, 8, 12, 12)).astype(np.float32)
    nodes = [
        _node_a("Conv", ["x", "w"], ["c"],
                {"group": 8, "pads": [2, 2, 2, 2]}),
        _node_a("LeakyRelu", ["c"], ["y"], {"alpha": 0.1}),
    ]
    blob = _model_io([_tensor("w", w)], nodes, ["x"], ["y"])
    out = np.asarray(_run(blob, x)["y"])
    with torch.no_grad():
        want = torch.nn.functional.leaky_relu(
            torch.nn.functional.conv2d(
                torch.from_numpy(x), torch.from_numpy(w), padding=2, groups=8
            ),
            0.1,
        ).numpy()
    np.testing.assert_allclose(out, want, atol=2e-5)


def test_conv_transpose_vs_torch():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((6, 4, 4, 4)).astype(np.float32) * 0.2  # (Cin, Cout, kH, kW)
    b = rng.standard_normal(4).astype(np.float32)
    x = rng.standard_normal((1, 6, 8, 8)).astype(np.float32)
    nodes = [
        _node_a("ConvTranspose", ["x", "w", "b"], ["y"],
                {"strides": [2, 2], "pads": [1, 1, 1, 1]}),
    ]
    blob = _model_io([_tensor("w", w), _tensor("b", b)], nodes, ["x"], ["y"])
    out = np.asarray(_run(blob, x)["y"])
    with torch.no_grad():
        want = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=2, padding=1,
        ).numpy()
    np.testing.assert_allclose(out, want, atol=3e-5)


def test_shape_arithmetic_chain():
    """Shape -> Gather -> Unsqueeze -> Concat -> Reshape folds on host."""
    nodes = [
        _node_a("Shape", ["x"], ["sh"]),
        _node_a("Gather", ["sh", "i0"], ["d0"], {"axis": 0}),
        _node_a("Unsqueeze", ["d0"], ["d0u"], {"axes": [0]}),
        _node_a("Concat", ["d0u", "rest"], ["newshape"], {"axis": 0}),
        _node_a("Reshape", ["x", "newshape"], ["y"]),
    ]
    tensors = [
        _tensor("i0", np.asarray(0, np.int64).reshape(())),
        _tensor("rest", np.asarray([-1], np.int64)),
    ]
    blob = _model_io(tensors, nodes, ["x"], ["y"])
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    out = _run(blob, jnp.asarray(x))["y"]
    assert out.shape == (2, 12)
    np.testing.assert_array_equal(np.asarray(out), x.reshape(2, 12))


def test_resize_slice_softmax_pad():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
    nodes = [
        _node_a("Resize", ["x", "", "scales"], ["r"], {"mode": "nearest"}),
        _node_a("Slice", ["r", "st", "en", "ax"], ["s"]),
        _node_a("Pad", ["s", "pads"], ["p"], {"mode": "constant"}),
        _node_a("Softmax", ["p"], ["y"], {"axis": -1}),
    ]
    tensors = [
        _tensor("scales", np.asarray([1, 1, 2, 2], np.float32)),
        _tensor("st", np.asarray([0, 0], np.int64)),
        _tensor("en", np.asarray([4, 4], np.int64)),
        _tensor("ax", np.asarray([2, 3], np.int64)),
        _tensor("pads", np.asarray([0, 0, 0, 0, 0, 0, 1, 1], np.int64)),
    ]
    blob = _model_io(tensors, nodes, ["x"], ["y"])
    out = np.asarray(_run(blob, x)["y"])
    with torch.no_grad():
        t = torch.nn.functional.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest")
        t = t[:, :, :4, :4]
        t = torch.nn.functional.pad(t, (0, 1, 0, 1))
        want = torch.softmax(t, dim=-1).numpy()
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_unknown_op_raises():
    nodes = [_node_a("FancyNewOp", ["x"], ["y"])]
    blob = _model_io([], nodes, ["x"], ["y"])
    with pytest.raises(NotImplementedError, match="FancyNewOp"):
        _run(blob, np.zeros((1,), np.float32))
