"""Minimal ONNX graph executor on jax — the framework's onnxruntime
replacement (reference runs DWPose + the Kim_Vocal_2 separator through
onnxruntime sessions, src/dwpose/wholebody.py:22-27,
src/dataset/audio_processor.py:56-70).

Scope: the static-shape inference graphs the reference depends on
(convnets: YOLOX, RTMPose, MDX-style separators). Ops are implemented on
jnp in NCHW (ONNX-native layout) so a whole graph runs as ONE jittable
function on TPU or CPU; small integer "shape arithmetic" chains (Shape ->
Gather -> Concat -> Reshape) are constant-folded on host at trace time.

    runner = OnnxRunner.from_file("yolox_l.onnx")
    outs = runner(np.zeros((1, 3, 640, 640), np.float32))   # dict name->arr
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from mmgt_tpu.utils.onnx_reader import parse_onnx_model

_DTYPE_ENUM = {
    1: jnp.float32, 2: jnp.uint8, 3: jnp.int8, 6: jnp.int32, 7: jnp.int64,
    9: jnp.bool_, 10: jnp.float16, 11: jnp.float64,
}


def _is_host(x) -> bool:
    """Host-side constant (safe to use for shapes/control decisions)."""
    return isinstance(x, np.ndarray) or np.isscalar(x)


def _np(x):
    return np.asarray(x)


def _pair(v, default):
    if v is None:
        return default
    return list(v)


def _conv(x, w, b, attrs):
    group = attrs.get("group", 1)
    strides = _pair(attrs.get("strides"), [1] * (x.ndim - 2))
    dil = _pair(attrs.get("dilations"), [1] * (x.ndim - 2))
    pads = attrs.get("pads")
    auto = attrs.get("auto_pad", "NOTSET")
    if auto in ("SAME_UPPER", "SAME_LOWER"):
        padding = "SAME"
    elif pads is None:
        padding = "VALID"
    else:
        half = len(pads) // 2
        padding = list(zip(pads[:half], pads[half:]))
    dn = ("NCHW", "OIHW", "NCHW") if x.ndim == 4 else ("NCW", "OIW", "NCW")
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), strides, padding, rhs_dilation=dil,
        dimension_numbers=dn, feature_group_count=group,
    )
    if b is not None:
        out = out + b.astype(x.dtype).reshape((1, -1) + (1,) * (x.ndim - 2))
    return out


def _conv_transpose(x, w, b, attrs):
    """ONNX ConvTranspose (weight (Cin, Cout, kH, kW)) as the textbook
    dilated-input convolution: conv(dilate_stride(x), flip(W)^T)."""
    strides = _pair(attrs.get("strides"), [1] * (x.ndim - 2))
    pads = attrs.get("pads") or [0] * (2 * (x.ndim - 2))
    half = len(pads) // 2
    spatial = tuple(range(2, w.ndim))
    wt = jnp.flip(
        jnp.transpose(jnp.asarray(w), (1, 0) + spatial), axis=spatial
    ).astype(x.dtype)                      # (Cout, Cin, kH, kW), flipped
    padding = [
        (k - 1 - p0, k - 1 - p1)
        for k, p0, p1 in zip(w.shape[2:], pads[:half], pads[half:])
    ]
    dn = ("NCHW", "OIHW", "NCHW") if x.ndim == 4 else ("NCW", "OIW", "NCW")
    out = jax.lax.conv_general_dilated(
        x, wt, [1] * (x.ndim - 2), padding, lhs_dilation=strides,
        dimension_numbers=dn,
    )
    if b is not None:
        out = out + b.astype(x.dtype).reshape((1, -1) + (1,) * (x.ndim - 2))
    return out


def _pool(x, attrs, op):
    ks = attrs["kernel_shape"]
    strides = _pair(attrs.get("strides"), [1] * len(ks))
    pads = attrs.get("pads")
    if attrs.get("auto_pad") in ("SAME_UPPER", "SAME_LOWER"):
        padding = "SAME"
    elif pads is None:
        padding = "VALID"
    else:
        half = len(pads) // 2
        padding = [(0, 0), (0, 0)] + list(zip(pads[:half], pads[half:]))
    window = (1, 1) + tuple(ks)
    strides = (1, 1) + tuple(strides)
    if op == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
            jax.lax.max, window, strides, padding,
        )
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, padding)
    n = jax.lax.reduce_window(
        jnp.ones_like(x), 0.0, jax.lax.add, window, strides, padding
    )
    return s / n


def _resize(x, scales, sizes, attrs):
    mode = attrs.get("mode", "nearest")
    if sizes is not None:
        out_shape = tuple(int(s) for s in _np(sizes))
    else:
        sc = _np(scales).astype(np.float64)
        out_shape = tuple(int(round(d * s)) for d, s in zip(x.shape, sc))
    # jax.image.resize matches onnxruntime only for integer-factor nearest
    # upsampling (the YOLOX PAFPN case) or half_pixel linear; other
    # coordinate_transformation_modes would silently drift — fail loudly.
    ctm = attrs.get("coordinate_transformation_mode", "half_pixel")
    integer_up = all(
        o % d == 0 for d, o in zip(x.shape, out_shape)
    )
    if ctm not in ("half_pixel", "pytorch_half_pixel") and not (
        mode == "nearest" and ctm == "asymmetric" and integer_up
    ):
        raise NotImplementedError(
            f"Resize coordinate_transformation_mode={ctm!r} (mode={mode!r}) "
            "not supported: jax.image.resize uses half-pixel sampling"
        )
    method = {"nearest": "nearest", "linear": "bilinear", "cubic": "bicubic"}[mode]
    return jax.image.resize(x, out_shape, method)


def _slice(x, starts, ends, axes, steps):
    starts, ends = _np(starts).tolist(), _np(ends).tolist()
    axes = list(range(len(starts))) if axes is None else _np(axes).tolist()
    steps = [1] * len(starts) if steps is None else _np(steps).tolist()
    idx = [slice(None)] * x.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        dim = x.shape[a]
        s2 = int(np.clip(s + dim if s < 0 else s, 0, dim))
        if e >= 2**31 - 1:          # INT_MAX sentinel = "to the end"
            e2 = dim
        else:
            e2 = int(np.clip(e + dim if e < 0 else e, 0, dim))
        idx[a] = slice(s2, e2, int(st))
    return x[tuple(idx)]


class OnnxRunner:
    """Executes a parsed ONNX graph. Call with positional arrays matching
    the graph inputs; returns {output_name: array}."""

    def __init__(self, inits, nodes, input_names, output_names):
        self.inits = {k: np.asarray(v) for k, v in inits.items()}
        self.nodes = nodes
        self.input_names = input_names
        self.output_names = output_names

    @classmethod
    def from_file(cls, path: str) -> "OnnxRunner":
        with open(path, "rb") as f:
            return cls(*parse_onnx_model(f.read()))

    @classmethod
    def from_bytes(cls, data: bytes) -> "OnnxRunner":
        return cls(*parse_onnx_model(data))

    def __call__(self, *arrays) -> Dict[str, Any]:
        if len(arrays) != len(self.input_names):
            raise ValueError(
                f"graph expects {len(self.input_names)} inputs "
                f"{self.input_names}, got {len(arrays)}"
            )
        env: Dict[str, Any] = dict(self.inits)
        env.update(zip(self.input_names, arrays))
        for node in self.nodes:
            outs = self._run_node(node, env)
            for name, val in zip(node["output"], outs):
                if name:
                    env[name] = val
        return {n: env[n] for n in self.output_names}

    # -------------------------------------------------------------- ops
    def _run_node(self, node, env) -> List[Any]:
        op = node["op_type"]
        attrs = node["attrs"]
        ins = [env[n] if n else None for n in node["input"]]
        x = ins[0] if ins else None

        def b2(fn):
            a, b = ins[0], ins[1]
            if _is_host(a) and _is_host(b):
                return [fn(_np(a), _np(b))]
            return [fn(jnp.asarray(a), jnp.asarray(b))]

        if op == "Conv":
            return [_conv(x, ins[1], ins[2] if len(ins) > 2 else None, attrs)]
        if op == "ConvTranspose":
            return [_conv_transpose(x, ins[1], ins[2] if len(ins) > 2 else None, attrs)]
        if op == "BatchNormalization":
            scale, bias, mean, var = ins[1:5]
            eps = attrs.get("epsilon", 1e-5)
            sh = (1, -1) + (1,) * (x.ndim - 2)
            inv = scale / np.sqrt(_np(var) + eps)
            return [x * jnp.asarray(inv).reshape(sh).astype(x.dtype)
                    + jnp.asarray(bias - mean * inv).reshape(sh).astype(x.dtype)]
        if op == "InstanceNormalization":
            eps = attrs.get("epsilon", 1e-5)
            axes = tuple(range(2, x.ndim))
            m = jnp.mean(x, axes, keepdims=True)
            v = jnp.var(x, axes, keepdims=True)
            sh = (1, -1) + (1,) * (x.ndim - 2)
            return [(x - m) * jax.lax.rsqrt(v + eps)
                    * jnp.asarray(ins[1]).reshape(sh).astype(x.dtype)
                    + jnp.asarray(ins[2]).reshape(sh).astype(x.dtype)]
        if op == "Gemm":
            a = jnp.asarray(x)
            bmat = jnp.asarray(ins[1])
            if attrs.get("transA"):
                a = a.T
            if attrs.get("transB"):
                bmat = bmat.T
            out = attrs.get("alpha", 1.0) * (a @ bmat)
            if len(ins) > 2 and ins[2] is not None:
                out = out + attrs.get("beta", 1.0) * jnp.asarray(ins[2])
            return [out]
        if op == "MatMul":
            return [jnp.matmul(jnp.asarray(x), jnp.asarray(ins[1]))]
        if op == "Relu":
            return [jax.nn.relu(x)]
        if op == "LeakyRelu":
            return [jax.nn.leaky_relu(x, attrs.get("alpha", 0.01))]
        if op == "PRelu":
            s = jnp.asarray(ins[1])
            return [jnp.where(x >= 0, x, x * s)]
        if op == "Sigmoid":
            return [jax.nn.sigmoid(x)]
        if op == "HardSigmoid":
            a = attrs.get("alpha", 0.2)
            bta = attrs.get("beta", 0.5)
            return [jnp.clip(a * x + bta, 0.0, 1.0)]
        if op == "Tanh":
            return [jnp.tanh(x)]
        if op == "Erf":
            return [jax.lax.erf(jnp.asarray(x))]
        if op == "Exp":
            return [jnp.exp(x)]
        if op == "Log":
            return [jnp.log(x)]
        if op == "Sqrt":
            return [jnp.sqrt(x)]
        if op == "Reciprocal":
            return [1.0 / x]
        if op == "Neg":
            return [-x]
        if op == "Abs":
            return [jnp.abs(x)]
        if op == "Floor":
            return [jnp.floor(x)]
        if op == "Clip":
            lo = ins[1] if len(ins) > 1 else attrs.get("min")
            hi = ins[2] if len(ins) > 2 else attrs.get("max")
            out = x
            if lo is not None:
                out = jnp.maximum(out, _np(lo) if _is_host(lo) else lo)
            if hi is not None:
                out = jnp.minimum(out, _np(hi) if _is_host(hi) else hi)
            return [out]
        if op == "Softmax":
            return [jax.nn.softmax(x, axis=attrs.get("axis", -1))]
        if op == "Add":
            return b2(lambda a, b: a + b)
        if op == "Sub":
            return b2(lambda a, b: a - b)
        if op == "Mul":
            return b2(lambda a, b: a * b)
        if op == "Div":
            return b2(lambda a, b: a / b)
        if op == "Pow":
            return b2(lambda a, b: a ** b)
        if op == "Min":
            return b2(jnp.minimum)
        if op == "Max":
            return b2(jnp.maximum)
        if op in ("Equal", "Greater", "Less"):
            fn = {"Equal": jnp.equal, "Greater": jnp.greater, "Less": jnp.less}[op]
            return b2(fn)
        if op == "Where":
            return [jnp.where(jnp.asarray(ins[0]), jnp.asarray(ins[1]), jnp.asarray(ins[2]))]
        if op == "Concat":
            ax = attrs["axis"]
            if all(_is_host(i) for i in ins):
                return [np.concatenate([_np(i) for i in ins], axis=ax)]
            return [jnp.concatenate([jnp.asarray(i) for i in ins], axis=ax)]
        if op == "Split":
            ax = attrs.get("axis", 0)
            if len(ins) > 1 and ins[1] is not None:
                sizes = _np(ins[1]).tolist()
            elif "split" in attrs:
                sizes = attrs["split"]
            else:
                n = len(node["output"])
                sizes = [x.shape[ax] // n] * n
            idx = np.cumsum(sizes)[:-1].tolist()
            return list(jnp.split(x, idx, axis=ax))
        if op == "Slice":
            if len(ins) > 1:  # opset >= 10: starts/ends/axes/steps as inputs
                return [_slice(x, ins[1], ins[2],
                               ins[3] if len(ins) > 3 else None,
                               ins[4] if len(ins) > 4 else None)]
            return [_slice(x, attrs["starts"], attrs["ends"],
                           attrs.get("axes"), attrs.get("steps"))]
        if op == "Gather":
            ax = attrs.get("axis", 0)
            if _is_host(x) and _is_host(ins[1]):
                return [np.take(_np(x), _np(ins[1]), axis=ax)]
            return [jnp.take(jnp.asarray(x), jnp.asarray(ins[1]), axis=ax)]
        if op == "Reshape":
            shape = _np(ins[1]).tolist()
            # 0 = keep dim, -1 = infer
            shape = [x.shape[i] if s == 0 else s for i, s in enumerate(shape)]
            return [jnp.reshape(jnp.asarray(x), shape)
                    if not _is_host(x) else np.reshape(_np(x), shape)]
        if op == "Transpose":
            perm = attrs.get("perm", list(range(x.ndim))[::-1])
            return [jnp.transpose(jnp.asarray(x), perm)]
        if op == "Unsqueeze":
            axes = _np(ins[1]).tolist() if len(ins) > 1 else attrs["axes"]
            out = _np(x) if _is_host(x) else x
            for a in sorted(axes):
                out = np.expand_dims(out, a) if _is_host(x) else jnp.expand_dims(out, a)
            return [out]
        if op == "Squeeze":
            axes = _np(ins[1]).tolist() if len(ins) > 1 and ins[1] is not None else attrs.get("axes")
            if axes is None:
                return [jnp.squeeze(x)]
            out = x
            for a in sorted(axes, reverse=True):
                out = jnp.squeeze(out, a) if not _is_host(x) else np.squeeze(_np(out), a)
            return [out]
        if op == "Flatten":
            ax = attrs.get("axis", 1)
            lead = int(np.prod(x.shape[:ax])) if ax else 1
            return [jnp.reshape(jnp.asarray(x), (lead, -1))]
        if op == "Expand":
            shape = _np(ins[1]).tolist()
            return [jnp.broadcast_to(jnp.asarray(x), np.broadcast_shapes(tuple(x.shape), tuple(shape)))]
        if op == "Cast":
            to = _DTYPE_ENUM[attrs["to"]]
            return [_np(x).astype(to) if _is_host(x) else x.astype(to)]
        if op == "Shape":
            return [np.asarray(x.shape, np.int64)]
        if op == "Constant":
            return [_np(attrs["value"])]
        if op == "ConstantOfShape":
            shape = _np(x).tolist()
            fill = attrs.get("value")
            fill = _np(fill).ravel()[0] if fill is not None else 0.0
            return [np.full(shape, fill)]
        if op == "Range":
            return [np.arange(_np(ins[0]).item(), _np(ins[1]).item(), _np(ins[2]).item())]
        if op in ("MaxPool", "AveragePool"):
            return [_pool(x, attrs, "max" if op == "MaxPool" else "avg")]
        if op == "GlobalAveragePool":
            return [jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)]
        if op == "Resize":
            scales = ins[2] if len(ins) > 2 else None
            sizes = ins[3] if len(ins) > 3 else None
            return [_resize(x, scales, sizes, attrs)]
        if op == "Pad":
            mode = attrs.get("mode", "constant")
            pads = _np(ins[1]).tolist() if len(ins) > 1 else attrs["pads"]
            half = len(pads) // 2
            cfg = list(zip(pads[:half], pads[half:]))
            if mode == "constant":
                cval = _np(ins[2]).item() if len(ins) > 2 and ins[2] is not None else attrs.get("value", 0.0)
                return [jnp.pad(jnp.asarray(x), cfg, constant_values=cval)]
            return [jnp.pad(jnp.asarray(x), cfg, mode={"reflect": "reflect", "edge": "edge"}[mode])]
        if op in ("ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin"):
            axes = attrs.get("axes")
            if axes is None and len(ins) > 1 and ins[1] is not None:
                axes = _np(ins[1]).tolist()
            keep = bool(attrs.get("keepdims", 1))
            fn = {"ReduceMean": jnp.mean, "ReduceSum": jnp.sum,
                  "ReduceMax": jnp.max, "ReduceMin": jnp.min}[op]
            return [fn(x, axis=tuple(axes) if axes is not None else None, keepdims=keep)]
        if op == "Identity":
            return [x]
        if op == "Dropout":
            return [x]  # inference mode
        if op == "Einsum":
            return [jnp.einsum(attrs["equation"], *[jnp.asarray(i) for i in ins])]
        if op == "LayerNormalization":
            eps = attrs.get("epsilon", 1e-5)
            ax = attrs.get("axis", -1)
            m = jnp.mean(x, axis=ax, keepdims=True)
            v = jnp.var(x, axis=ax, keepdims=True)
            out = (x - m) * jax.lax.rsqrt(v + eps) * jnp.asarray(ins[1])
            if len(ins) > 2 and ins[2] is not None:
                out = out + jnp.asarray(ins[2])
            return [out]
        raise NotImplementedError(
            f"ONNX op {op!r} (node {node['name'] or node['output']}) is not "
            "implemented in mmgt_tpu.utils.onnx_exec"
        )
