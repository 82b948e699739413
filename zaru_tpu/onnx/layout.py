"""NHWC internal-layout mode for imported graphs.

ONNX CNNs are NCHW, but the TPU's native convolution layout is NHWC:
lowering NCHW convs makes XLA thread layout changes through the graph, and
the image sampler's natural output is ``[H, W, C]`` anyway. This module
lets the importer execute a (logically NCHW) ONNX graph with all
activations physically NHWC: layout-aware ops (Conv, pools, Pad, Resize,
Concat, per-channel broadcasts) run natively on NHWC tensors, anything
else transparently materializes back to NCHW. A tag per value tracks which
physical layout it currently has, so conversions happen only at genuine
layout boundaries (in the bundled perception models: once at the input and
once before each head's Reshape).

Replaces the reference's reliance on its ONNX runtimes' internal layout
handling (reference crates/zaru/src/nn/mod.rs:82-106 validates NCHW/NHWC
at the boundary and leaves the rest to tract/ort).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from .ops import OPS, _conv_pads

__all__ = ["to_nhwc", "to_nchw", "dispatch_nhwc"]

NCHW_TO_NHWC = (0, 2, 3, 1)
NHWC_TO_NCHW = (0, 3, 1, 2)


def to_nhwc(x):
    return jnp.transpose(x, NCHW_TO_NHWC)


def to_nchw(x):
    return jnp.transpose(x, NHWC_TO_NCHW)


def _materialize(vals, tags):
    return [
        to_nchw(v) if (t and v is not None) else v
        for v, t in zip(vals, tags)
    ]


# --- handlers: (node, vals, statics, tags) -> (results, out_tags) ---------


def _conv(node, vals, statics, tags):
    if vals[0].ndim != 4:
        return None  # 1-D conv path falls back
    # An untagged (NCHW) input converts here — this is the single entry
    # conversion of the whole graph.
    x = vals[0] if tags[0] else to_nhwc(vals[0])
    w = vals[1]
    b = vals[2] if len(vals) > 2 else None
    strides = node.attrs.get("strides", [1, 1])
    dilations = node.attrs.get("dilations", [1, 1])
    group = node.attrs.get("group", 1)
    auto_pad, pad_pairs = _conv_pads(node, 2)
    if auto_pad == "SAME_UPPER":
        padding = "SAME"
    elif auto_pad == "SAME_LOWER":
        padding = "SAME_LOWER"  # odd pixel at the BEGIN edge (ONNX spec)
    elif auto_pad == "VALID":
        padding = "VALID"
    else:
        padding = pad_pairs
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=strides,
        padding=padding,
        rhs_dilation=dilations,
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        feature_group_count=group,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        out = out + b.astype(out.dtype)  # trailing-axis broadcast
    return [out], [True]


def _is_elementwise_unary(op):
    return op in (
        "Relu", "Sigmoid", "Tanh", "Clip", "LeakyRelu", "Elu", "Gelu",
        "HardSigmoid", "HardSwish", "Neg", "Abs", "Sqrt", "Exp", "Log",
        "Floor", "Ceil", "Erf", "Softplus", "Identity", "Cast", "Dropout",
    )


def _unary(node, vals, statics, tags):
    res = OPS[node.op_type](node, vals, statics)
    results = res if isinstance(res, list) else [res]
    return results, [tags[0]] * len(results)


def _channel_vector(v):
    """[1,C,1,1] / [C,1,1] constants reshaped for NHWC trailing-axis
    broadcast; None if not per-channel-shaped."""
    if v is None or not hasattr(v, "shape"):
        return None
    shape = tuple(v.shape)
    if len(shape) >= 2 and all(d == 1 for d in shape[-2:]):
        core = shape[:-2]
        if len(core) == 1 or (len(core) == 2 and core[0] == 1):
            return jnp.reshape(v, (shape[-3] if len(core) else 1,))
    return None


def _binary(node, vals, statics, tags):
    a, b = vals[0], vals[1]
    ta, tb = tags[0], tags[1]
    if len(vals) > 2 and any(t != (ta or tb) for t in tags[2:]):
        # Variadic Min/Max with mixed layouts beyond the first two
        # inputs: decline so the dispatcher falls back to the NCHW path
        # instead of silently mixing physical layouts.
        return None
    if ta == tb:
        pass  # same physical layout on both sides
    elif ta and not tb:
        nb = b if (np.ndim(b) == 0 or all(d == 1 for d in np.shape(b))) else _channel_vector(b)
        if nb is None:
            return None
        b = nb
    elif tb and not ta:
        na = a if (np.ndim(a) == 0 or all(d == 1 for d in np.shape(a))) else _channel_vector(a)
        if na is None:
            return None
        a = na
    res = OPS[node.op_type](node, [a, b] + list(vals[2:]), statics)
    return [res], [ta or tb]


def _prelu(node, vals, statics, tags):
    if not tags[0]:
        return None
    slope = _channel_vector(vals[1])
    if slope is None and vals[1] is not None and np.ndim(vals[1]) <= 1:
        slope = vals[1]
    if slope is None:
        return None
    x = vals[0]
    return [jnp.where(x >= 0, x, x * slope.astype(x.dtype))], [True]


def _pool(node, vals, statics, tags):
    """Max/Average/Global pools natively on NHWC (reduce_window is
    layout-agnostic; only the window/stride/pad vectors permute)."""
    if not tags[0] or vals[0].ndim != 4:
        return None
    op = node.op_type
    x = vals[0]
    if op in ("GlobalAveragePool", "GlobalMaxPool"):
        red = jnp.mean if op == "GlobalAveragePool" else jnp.max
        return [red(x, axis=(1, 2), keepdims=True)], [True]
    # Windowed pools: reuse the NCHW implementation via dim permutation of
    # window/stride/pads (reduce_window is layout-agnostic).
    kernel = node.attrs["kernel_shape"]
    strides = node.attrs.get("strides", [1] * len(kernel))
    if len(kernel) != 2 or node.attrs.get("ceil_mode", 0):
        return None
    auto_pad, pad_pairs = _conv_pads(node, 2)
    if auto_pad and auto_pad != "NOTSET":
        return None
    (pt, pb), (pl, pr) = pad_pairs
    window = (1, kernel[0], kernel[1], 1)
    strides4 = (1, strides[0], strides[1], 1)
    pads4 = ((0, 0), (pt, pb), (pl, pr), (0, 0))
    if op == "MaxPool":
        out = lax.reduce_window(x, -jnp.inf, lax.max, window, strides4, pads4)
        return [out], [True]
    if op == "AveragePool" and node.attrs.get("count_include_pad", 0):
        s = lax.reduce_window(x, 0.0, lax.add, window, strides4, pads4)
        return [s / (kernel[0] * kernel[1])], [True]
    if op == "AveragePool" and not (pt or pb or pl or pr):
        s = lax.reduce_window(x, 0.0, lax.add, window, strides4, pads4)
        return [s / (kernel[0] * kernel[1])], [True]
    return None


def _pad(node, vals, statics, tags):
    if not tags[0] or vals[0].ndim != 4:
        return None
    mode = node.attrs.get("mode", "constant")
    if isinstance(mode, bytes):
        mode = mode.decode()
    if mode != "constant":
        return None
    pads = node.attrs.get("pads")
    if pads is None:
        if len(statics) > 1 and statics[1] is not None:
            pads = [int(p) for p in np.asarray(statics[1]).reshape(-1)]
        else:
            return None
    value = float(node.attrs.get("value", 0.0))
    if len(vals) > 2 and statics[2] is not None:
        value = float(np.asarray(statics[2]).reshape(()))
    n = len(pads) // 2
    if n != 4:
        return None
    begin, end = pads[:4], pads[4:]
    perm = NCHW_TO_NHWC
    cfg = [(int(begin[p]), int(end[p])) for p in perm]
    out = jnp.pad(vals[0], cfg, constant_values=value)
    return [out], [True]


def _concat(node, vals, statics, tags):
    if not all(tags) or any(v.ndim != 4 for v in vals):
        return None
    axis = node.attrs.get("axis", 0)
    if axis < 0:
        axis += 4
    nhwc_axis = {0: 0, 1: 3, 2: 1, 3: 2}[axis]
    return [jnp.concatenate(vals, axis=nhwc_axis)], [True]


def _resize(node, vals, statics, tags):
    if not tags[0] or vals[0].ndim != 4:
        return None
    # jax.image.resize handles arbitrary dim orders, so reuse the NCHW
    # Resize op with the target-size / scale vector permuted to NHWC
    # instead of permuting the data.
    x = vals[0]
    fake_vals = [x] + list(vals[1:])
    if len(statics) > 3 and statics[3] is not None and np.size(statics[3]) == 4:
        sizes_nchw = [int(s) for s in np.asarray(statics[3]).reshape(-1)]
        sizes_nhwc = np.asarray([sizes_nchw[p] for p in NCHW_TO_NHWC], np.int64)
        new_statics = list(statics)
        new_statics[3] = sizes_nhwc
        res = OPS["Resize"](node, fake_vals, new_statics)
        return [res], [True]
    if len(statics) > 2 and statics[2] is not None and np.size(statics[2]) == 4:
        scales_nchw = np.asarray(statics[2]).reshape(-1)
        scales_nhwc = np.asarray(
            [scales_nchw[p] for p in NCHW_TO_NHWC], scales_nchw.dtype
        )
        new_statics = list(statics)
        new_statics[2] = scales_nhwc
        res = OPS["Resize"](node, fake_vals, new_statics)
        return [res], [True]
    return None


def _transpose(node, vals, statics, tags):
    if not tags[0] or vals[0].ndim != 4:
        return None
    perm = tuple(node.attrs.get("perm", [3, 2, 1, 0]))
    if perm == NCHW_TO_NHWC:
        # The classic pre-head NCHW→NHWC transpose (MediaPipe anchors
        # layout): the physical buffer IS the result already.
        return [vals[0]], [False]
    return None


_HANDLERS = {
    "Conv": _conv,
    "Transpose": _transpose,
    "PRelu": _prelu,
    "MaxPool": _pool,
    "AveragePool": _pool,
    "GlobalAveragePool": _pool,
    "GlobalMaxPool": _pool,
    "Pad": _pad,
    "Concat": _concat,
    "Resize": _resize,
    "Add": _binary,
    "Sub": _binary,
    "Mul": _binary,
    "Div": _binary,
    "Min": _binary,
    "Max": _binary,
}


def dispatch_nhwc(node, vals, statics, tags):
    """Executes ``node`` keeping activations NHWC where possible.

    ``tags[i]`` is True when ``vals[i]`` is physically NHWC. Returns
    ``(results, out_tags)``. Falls back to the NCHW op (materializing
    tagged inputs) whenever a handler declines.
    """
    op = node.op_type
    handler = _HANDLERS.get(op)
    if handler is None and _is_elementwise_unary(op):
        handler = _unary
    if handler is not None:
        out = handler(node, vals, statics, tags)
        if out is not None:
            return out
    vals = _materialize(vals, tags)
    res = OPS[op](node, vals, statics)
    results = res if isinstance(res, list) else [res]
    return results, [False] * len(results)
