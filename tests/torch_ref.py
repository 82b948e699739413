"""Independent ONNX executor on torch (CPU) used ONLY as a test oracle.

This re-implements the bundled models' op dialect with torch.nn.functional so
the JAX importer (zaru_tpu/onnx) can be cross-validated against a second,
independently written lowering. It is not part of the framework.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from zaru_tpu.onnx.proto import OnnxModel


def _t(x):
    t = torch.from_numpy(np.asarray(x).copy()) if not isinstance(x, torch.Tensor) else x
    return t.float() if t.dtype == torch.float16 else t


def run_torch(model: OnnxModel, inputs: list[np.ndarray]) -> list[np.ndarray]:
    g = model.graph
    env: dict[str, torch.Tensor] = {k: _t(v) for k, v in g.initializers.items()}
    init_names = set(g.initializers)
    graph_inputs = [vi for vi in g.inputs if vi.name not in init_names]
    for vi, x in zip(graph_inputs, inputs):
        env[vi.name] = _t(x)

    for node in g.nodes:
        op = node.op_type
        a = node.attrs
        ins = [env[i] if i else None for i in node.inputs]

        if op == "Conv":
            x, w = ins[0], ins[1]
            b = ins[2] if len(ins) > 2 else None
            pads = a.get("pads", [0, 0, 0, 0])
            # torch needs symmetric pads; pad manually when asymmetric.
            pt, pl, pb, pr = pads[0], pads[1], pads[2], pads[3]
            if pt == pb and pl == pr:
                out = F.conv2d(
                    x, w, b, stride=a.get("strides", [1, 1]),
                    padding=(pt, pl), dilation=a.get("dilations", [1, 1]),
                    groups=a.get("group", 1),
                )
            else:
                x = F.pad(x, (pl, pr, pt, pb))
                out = F.conv2d(
                    x, w, b, stride=a.get("strides", [1, 1]),
                    dilation=a.get("dilations", [1, 1]), groups=a.get("group", 1),
                )
        elif op == "Relu":
            out = F.relu(ins[0])
        elif op == "LeakyRelu":
            out = F.leaky_relu(ins[0], float(a.get("alpha", 0.01)))
        elif op == "HardSigmoid":
            out = torch.clamp(
                float(a.get("alpha", 0.2)) * ins[0] + float(a.get("beta", 0.5)),
                0.0, 1.0,
            )
        elif op == "Tanh":
            out = torch.tanh(ins[0])
        elif op == "Elu":
            out = F.elu(ins[0], float(a.get("alpha", 1.0)))
        elif op == "Softmax":
            out = torch.softmax(ins[0], dim=int(a.get("axis", -1)))
        elif op == "Exp":
            out = torch.exp(ins[0])
        elif op == "Sqrt":
            out = torch.sqrt(ins[0])
        elif op == "Abs":
            out = torch.abs(ins[0])
        elif op == "Neg":
            out = -ins[0]
        elif op == "Floor":
            out = torch.floor(ins[0])
        elif op == "Ceil":
            out = torch.ceil(ins[0])
        elif op == "Round":
            # ONNX Round = round-half-to-even; torch.round matches.
            out = torch.round(ins[0])
        elif op == "Max":
            out = ins[0]
            for v in ins[1:]:
                out = torch.maximum(out, v)
        elif op == "Min":
            out = ins[0]
            for v in ins[1:]:
                out = torch.minimum(out, v)
        elif op == "Pow":
            out = torch.pow(ins[0], ins[1])
        elif op == "BatchNormalization":
            x, scale, bias, mean, var = ins[:5]
            eps = float(a.get("epsilon", 1e-5))
            shp = (1, -1) + (1,) * (x.dim() - 2)
            out = (x - mean.reshape(shp)) / torch.sqrt(
                var.reshape(shp) + eps
            ) * scale.reshape(shp) + bias.reshape(shp)
        elif op == "InstanceNormalization":
            x, scale, bias = ins[:3]
            eps = float(a.get("epsilon", 1e-5))
            dims = tuple(range(2, x.dim()))
            mean = x.mean(dim=dims, keepdim=True)
            var = x.var(dim=dims, keepdim=True, unbiased=False)
            shp = (1, -1) + (1,) * (x.dim() - 2)
            out = (x - mean) / torch.sqrt(var + eps) * scale.reshape(
                shp
            ) + bias.reshape(shp)
        elif op == "MatMul":
            out = ins[0] @ ins[1]
        elif op == "Flatten":
            axis = int(a.get("axis", 1))
            lead = int(np.prod(ins[0].shape[:axis])) if axis > 0 else 1
            out = ins[0].reshape(lead, -1)
        elif op == "Slice":
            data = ins[0]
            if "starts" in a:  # opset < 10
                starts, ends = a["starts"], a["ends"]
                axes = a.get("axes", list(range(len(starts))))
                steps = [1] * len(starts)
            else:
                starts = ins[1].numpy().tolist()
                ends = ins[2].numpy().tolist()
                axes = (
                    ins[3].numpy().tolist()
                    if len(ins) > 3 and ins[3] is not None
                    else list(range(len(starts)))
                )
                steps = (
                    ins[4].numpy().tolist()
                    if len(ins) > 4 and ins[4] is not None
                    else [1] * len(starts)
                )
            slicers = [slice(None)] * data.dim()
            for s0, e0, ax, st in zip(starts, ends, axes, steps):
                slicers[int(ax)] = slice(int(s0), int(e0), int(st))
            out = data[tuple(slicers)]
        elif op == "Split":
            axis = int(a.get("axis", 0))
            split = a.get("split")
            if split is None and len(ins) > 1 and ins[1] is not None:
                split = ins[1].numpy().tolist()
            if split is None:
                split = ins[0].shape[axis] // len(node.outputs)
            else:
                split = [int(s) for s in split]
            out = list(torch.split(ins[0], split, dim=axis))
        elif op == "ConvTranspose":
            x, w = ins[0], ins[1]
            b = ins[2] if len(ins) > 2 else None
            pads = a.get("pads", [0, 0, 0, 0])
            assert pads[0] == pads[2] and pads[1] == pads[3], (
                "oracle handles symmetric ConvTranspose pads only"
            )
            out = F.conv_transpose2d(
                x, w, b, stride=a.get("strides", [1, 1]),
                padding=(pads[0], pads[1]),
                output_padding=a.get("output_padding", [0, 0]),
                groups=int(a.get("group", 1)),
                dilation=a.get("dilations", [1, 1]),
            )
        elif op == "PRelu":
            slope = ins[1]
            out = torch.where(ins[0] < 0, slope * ins[0], ins[0])
        elif op == "Sigmoid":
            out = torch.sigmoid(ins[0])
        elif op == "Clip":
            lo = a.get("min")
            hi = a.get("max")
            if lo is None and len(ins) > 1 and ins[1] is not None:
                lo = float(ins[1])
            if hi is None and len(ins) > 2 and ins[2] is not None:
                hi = float(ins[2])
            out = torch.clamp(ins[0], lo, hi)
        elif op == "Add":
            out = ins[0] + ins[1]
        elif op == "Mul":
            out = ins[0] * ins[1]
        elif op == "Sub":
            out = ins[0] - ins[1]
        elif op == "Div":
            out = ins[0] / ins[1]
        elif op == "Pad":
            pads = a.get("pads")
            if pads is None:
                pads = ins[1].numpy().tolist()
            rank = ins[0].dim()
            # torch pad order: last dim first (l, r, then prev dim ...).
            tpads = []
            for d in reversed(range(rank)):
                tpads += [int(pads[d]), int(pads[d + rank])]
            out = F.pad(ins[0], tpads, value=float(a.get("value", 0.0)))
        elif op == "MaxPool":
            out = F.max_pool2d(
                ins[0], a["kernel_shape"], stride=a.get("strides"),
                padding=[p for p in a.get("pads", [0, 0, 0, 0])[:2]],
                ceil_mode=bool(a.get("ceil_mode", 0)),
            )
        elif op == "AveragePool":
            out = F.avg_pool2d(
                ins[0], a["kernel_shape"], stride=a.get("strides"),
                padding=[p for p in a.get("pads", [0, 0, 0, 0])[:2]],
                ceil_mode=bool(a.get("ceil_mode", 0)),
                count_include_pad=bool(a.get("count_include_pad", 0)),
            )
        elif op == "GlobalAveragePool":
            out = ins[0].mean(dim=(2, 3), keepdim=True)
        elif op == "ReduceMean":
            axes = a.get("axes")
            out = ins[0].mean(dim=tuple(axes), keepdim=bool(a.get("keepdims", 1)))
        elif op == "Resize":
            sizes = ins[3].numpy().tolist() if len(ins) > 3 and ins[3] is not None and ins[3].numel() else None
            if sizes is None and len(ins) > 2 and ins[2] is not None and ins[2].numel():
                # Resize by scales (input #2) — the other spec spelling.
                scales = ins[2].numpy().tolist()
                sizes = [
                    int(np.floor(d * s))
                    for d, s in zip(ins[0].shape, scales)
                ]
            mode = a.get("mode", "nearest")
            if isinstance(mode, bytes):
                mode = mode.decode()
            if mode == "linear":
                out = F.interpolate(
                    ins[0], size=[int(s) for s in sizes[2:]], mode="bilinear",
                    align_corners=False,
                )
            else:
                out = F.interpolate(ins[0], size=[int(s) for s in sizes[2:]], mode="nearest")
        elif op == "Reshape":
            shape = [int(s) for s in ins[1].numpy().tolist()]
            shape = [ins[0].shape[i] if s == 0 else s for i, s in enumerate(shape)]
            out = ins[0].reshape(shape)
        elif op == "Transpose":
            out = ins[0].permute(a["perm"])
        elif op == "Concat":
            out = torch.cat([i for i in ins], dim=a["axis"])
        elif op == "Squeeze":
            axes = a.get("axes")
            out = ins[0]
            for ax in sorted(axes, reverse=True):
                out = out.squeeze(ax)
        elif op == "Gemm":
            x, w = ins[0], ins[1]
            if a.get("transA", 0):
                x = x.t()
            if a.get("transB", 0):
                w = w.t()
            out = a.get("alpha", 1.0) * (x @ w)
            if len(ins) > 2 and ins[2] is not None:
                out = out + a.get("beta", 1.0) * ins[2]
        elif op == "Constant":
            out = _t(a["value"])
        else:
            raise NotImplementedError(f"torch oracle: op {op}")

        outs = out if isinstance(out, list) else [out]
        for name, val in zip(node.outputs, outs):
            env[name] = val

    return [env[vi.name].numpy() for vi in g.outputs]
