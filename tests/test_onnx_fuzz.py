"""Property-style fuzz of the ONNX importer over the supported dialect.

The reference delegates ONNX execution to three mature external runtimes
(reference nn/mod.rs:369-396); this framework ships its own wire-format
reader + JAX op registry, so its correctness surface must be hardened
beyond the 10 bundled models. Each seeded case authors a random graph
with :mod:`zaru_tpu.onnx.writer` over the dialect's CNN idioms —
convs (incl. depthwise / grouped / asymmetric pads / strides / odd
channel counts), transposed convs, activations (incl. LeakyRelu /
HardSigmoid / Elu / Tanh / mid-graph Softmax), batch / instance
normalization, pools, pads, resize, residual add/mul/max/min/sub,
concat, channel/strided slices, channel splits (with a dangling
output), reductions, reshape/transpose, gemm / matmul+softmax heads —
and cross-checks the imported JAX lowering against the independent
torch oracle (tests/torch_ref.py) on random inputs.

Any divergence is a real importer (or oracle) bug: both lowerings are
written independently against the ONNX spec.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

from zaru_tpu.onnx import load_model
from zaru_tpu.onnx.writer import OnnxWriter

from torch_ref import run_torch
from zaru_tpu.onnx.proto import parse_model


def _conv_out(size, k, stride, p0, p1):
    return (size + p0 + p1 - k) // stride + 1


class GraphGen:
    """Seeded random graph builder with shape tracking.

    Maintains the current tensor (NCHW) and a pool of earlier same-shaped
    tensors for residual/concat edges. Every op keeps spatial dims >= 2
    so downstream ops stay valid.
    """

    def __init__(self, rng: np.random.Generator):
        self.rng = rng
        self.w = OnnxWriter(graph_name="fuzz")
        c = int(rng.choice([3, 4, 5, 7, 8]))  # odd counts included
        h = int(rng.choice([12, 16, 17, 20]))
        wd = int(rng.choice([12, 16, 19, 20]))
        self.in_shape = (1, c, h, wd)
        self.w.input("x", self.in_shape)
        self.cur = "x"
        self.shape = list(self.in_shape)
        self.n = 0
        self.seen: list[tuple[str, tuple]] = []

    def _name(self, tag):
        self.n += 1
        return f"{tag}_{self.n}"

    def _init(self, tag, arr):
        name = self._name(tag)
        self.w.initializer(name, arr.astype(arr.dtype))
        return name

    # --- ops -------------------------------------------------------------

    def op_conv(self):
        rng = self.rng
        _, c, h, wd = self.shape
        k = int(rng.choice([1, 3, 5]))
        if min(h, wd) < k + 1:
            k = 1
        stride = int(rng.choice([1, 1, 2]))
        pads = [int(rng.integers(0, 3)) for _ in range(4)]  # t, l, b, r
        if k == 1:
            pads = [0, 0, 0, 0]
        # groups: 1, depthwise, or a proper divisor.
        divs = [g for g in (2, 4) if c % g == 0]
        groups = int(rng.choice([1, 1, c] + divs))
        cout = (
            c if groups == c
            else int(rng.choice([4, 6, 8])) * (groups if groups > 1 else 1)
        )
        wshape = (cout, c // groups, k, k)
        wname = self._init("w", rng.normal(0, 0.4, wshape).astype(np.float32))
        ins = [self.cur, wname]
        if rng.random() < 0.7:
            ins.append(self._init("b", rng.normal(0, 0.2, (cout,)).astype(np.float32)))
        out = self._name("conv")
        self.w.node(
            "Conv", ins, [out], kernel_shape=[k, k],
            strides=[stride, stride],
            pads=[pads[0], pads[1], pads[2], pads[3]], group=groups,
        )
        h2 = _conv_out(h, k, stride, pads[0], pads[2])
        w2 = _conv_out(wd, k, stride, pads[1], pads[3])
        if h2 < 2 or w2 < 2:
            return False  # abandoned: caller keeps previous tensor
        self.cur, self.shape = out, [1, cout, h2, w2]
        return True

    def op_act(self):
        rng = self.rng
        kind = rng.choice([
            "Relu", "Sigmoid", "Clip", "PRelu", "LeakyRelu", "HardSigmoid",
            "Tanh", "Elu", "Softmax",
        ])
        out = self._name(str(kind).lower())
        if kind == "Clip":
            lo = self._init("lo", np.asarray(0.0, np.float32))
            hi = self._init("hi", np.asarray(6.0, np.float32))
            self.w.node("Clip", [self.cur, lo, hi], [out])
        elif kind == "PRelu":
            slope = self._init(
                "slope",
                rng.uniform(0.05, 0.4, (self.shape[1], 1, 1)).astype(np.float32),
            )
            self.w.node("PRelu", [self.cur, slope], [out])
        elif kind == "LeakyRelu":
            self.w.node("LeakyRelu", [self.cur], [out],
                        alpha=float(rng.uniform(0.05, 0.3)))
        elif kind == "HardSigmoid":
            self.w.node("HardSigmoid", [self.cur], [out],
                        alpha=0.2, beta=0.5)
        elif kind == "Elu":
            self.w.node("Elu", [self.cur], [out],
                        alpha=float(rng.uniform(0.5, 1.5)))
        elif kind == "Softmax":
            self.w.node("Softmax", [self.cur], [out], axis=1)
        else:
            self.w.node(str(kind), [self.cur], [out])
        self.cur = out
        return True

    def op_residual(self):
        mates = [n for n, s in self.seen if s == tuple(self.shape)]
        if not mates:
            return False
        other = mates[int(self.rng.integers(0, len(mates)))]
        out = self._name("add")
        op = str(self.rng.choice(["Add", "Add", "Mul", "Max", "Min", "Sub"]))
        self.w.node(op, [self.cur, other], [out])
        self.cur = out
        return True

    def op_norm(self):
        """BatchNormalization (inference form) or InstanceNormalization
        with random per-channel parameters."""
        rng = self.rng
        c = self.shape[1]
        scale = self._init("bns", rng.uniform(0.5, 1.5, (c,)).astype(np.float32))
        bias = self._init("bnb", rng.normal(0, 0.3, (c,)).astype(np.float32))
        out = self._name("norm")
        if rng.random() < 0.5:
            mean = self._init("bnm", rng.normal(0, 0.5, (c,)).astype(np.float32))
            var = self._init("bnv", rng.uniform(0.3, 2.0, (c,)).astype(np.float32))
            self.w.node(
                "BatchNormalization", [self.cur, scale, bias, mean, var],
                [out], epsilon=1e-5,
            )
        else:
            self.w.node(
                "InstanceNormalization", [self.cur, scale, bias], [out],
                epsilon=1e-5,
            )
        self.cur = out
        return True

    def op_slice(self):
        """Channel slice (opset-10 input style), sometimes a strided
        spatial slice — exercises _need_static routing of int64 inits."""
        rng = self.rng
        _, c, h, wd = self.shape
        if rng.random() < 0.6 and c > 2:
            keep = int(rng.integers(2, c))
            starts, ends, axes, steps = [0], [keep], [1], [1]
            self.shape = [1, keep, h, wd]
        elif h >= 5:
            starts, ends, axes, steps = [0], [h], [2], [2]
            self.shape = [1, c, -(-h // 2), wd]
        else:
            return False
        sn = self._init("sst", np.asarray(starts, np.int64))
        en = self._init("sen", np.asarray(ends, np.int64))
        an = self._init("sax", np.asarray(axes, np.int64))
        tn = self._init("sstp", np.asarray(steps, np.int64))
        out = self._name("slice")
        self.w.node("Slice", [self.cur, sn, en, an, tn], [out])
        self.cur = out
        return True

    def op_split(self):
        """Equal channel split; the graph continues with one half (the
        other output dangles — importers must tolerate unused outputs)."""
        c = self.shape[1]
        if c % 2 or c < 4:
            return False
        o1, o2 = self._name("sp"), self._name("sp")
        self.w.node("Split", [self.cur], [o1, o2], axis=1)
        self.cur = o1 if self.rng.random() < 0.5 else o2
        self.shape = [1, c // 2, self.shape[2], self.shape[3]]
        return True

    def op_convtranspose(self):
        """Stride-2 transposed conv (the decoder/upsample idiom),
        symmetric pads, optional bias."""
        rng = self.rng
        _, c, h, wd = self.shape
        k = int(rng.choice([2, 3]))
        p = int(rng.integers(0, min(2, k)))
        cout = int(rng.choice([3, 4, 6]))
        wname = self._init(
            "tw", rng.normal(0, 0.3, (c, cout, k, k)).astype(np.float32)
        )
        ins = [self.cur, wname]
        if rng.random() < 0.5:
            ins.append(
                self._init("tb", rng.normal(0, 0.2, (cout,)).astype(np.float32))
            )
        out = self._name("convt")
        self.w.node(
            "ConvTranspose", ins, [out], kernel_shape=[k, k],
            strides=[2, 2], pads=[p, p, p, p], group=1,
        )
        h2 = (h - 1) * 2 - 2 * p + k
        w2 = (wd - 1) * 2 - 2 * p + k
        if h2 < 2 or w2 < 2:
            return False
        self.cur, self.shape = out, [1, cout, h2, w2]
        return True

    def op_scale(self):
        arr = self.rng.normal(1.0, 0.3, (self.shape[1], 1, 1)).astype(np.float32)
        cname = self._init("scale", arr)
        out = self._name("mul")
        self.w.node("Mul", [self.cur, cname], [out])
        self.cur = out
        return True

    def op_pad(self):
        rng = self.rng
        pt, pl, pb, pr = (int(rng.integers(0, 3)) for _ in range(4))
        pads = self._init(
            "pads", np.asarray([0, 0, pt, pl, 0, 0, pb, pr], np.int64)
        )
        out = self._name("pad")
        self.w.node("Pad", [self.cur, pads], [out], mode="constant")
        self.shape = [
            1, self.shape[1], self.shape[2] + pt + pb, self.shape[3] + pl + pr,
        ]
        self.cur = out
        return True

    def op_pool(self):
        rng = self.rng
        _, c, h, wd = self.shape
        k = int(rng.choice([2, 3]))
        if min(h, wd) < k + 1:
            return False
        stride = int(rng.choice([1, 2, 2]))
        # Symmetric pads (< k as ONNX requires; avg pools exclude pad by
        # default in both lowerings).
        p = int(rng.integers(0, min(2, k)))
        kind = str(rng.choice(["MaxPool", "AveragePool"]))
        out = self._name("pool")
        self.w.node(
            kind, [self.cur], [out], kernel_shape=[k, k],
            strides=[stride, stride], pads=[p, p, p, p],
        )
        h2 = _conv_out(h, k, stride, p, p)
        w2 = _conv_out(wd, k, stride, p, p)
        if h2 < 2 or w2 < 2:
            return False
        self.cur, self.shape = out, [1, c, h2, w2]
        return True

    def op_resize(self):
        mode = str(self.rng.choice(["nearest", "linear"]))
        scales = self._init("scales", np.asarray([1, 1, 2, 2], np.float32))
        roi = self._init("roi", np.zeros((0,), np.float32))
        out = self._name("resize")
        self.w.node("Resize", [self.cur, roi, scales], [out], mode=mode)
        self.shape = [1, self.shape[1], self.shape[2] * 2, self.shape[3] * 2]
        self.cur = out
        return True

    def op_concat(self):
        mates = [n for n, s in self.seen if s == tuple(self.shape)]
        if not mates:
            return False
        other = mates[int(self.rng.integers(0, len(mates)))]
        out = self._name("cat")
        self.w.node("Concat", [self.cur, other], [out], axis=1)
        self.shape = [1, self.shape[1] * 2, self.shape[2], self.shape[3]]
        self.cur = out
        return True

    def finish(self):
        """Random head: raw NCHW output, GAP->Gemm, reduce, or
        transpose+reshape flatten."""
        rng = self.rng
        head = rng.choice(["raw", "gemm", "reduce", "flatten", "softmax"])
        if head == "softmax":
            # GAP -> Flatten -> MatMul -> Softmax: the classifier tail.
            self.w.node("GlobalAveragePool", [self.cur], ["gap"])
            self.w.node("Flatten", ["gap"], ["flat"], axis=1)
            n_out = int(rng.choice([4, 7]))
            wname = self._init(
                "mw",
                rng.normal(0, 0.3, (self.shape[1], n_out)).astype(np.float32),
            )
            self.w.node("MatMul", ["flat", wname], ["logits"])
            self.w.node("Softmax", ["logits"], ["out"], axis=-1)
            out_shape = (1, n_out)
        elif head == "gemm":
            self.w.node("GlobalAveragePool", [self.cur], ["gap"])
            shp = self._init("shp", np.asarray([1, self.shape[1]], np.int64))
            self.w.node("Reshape", ["gap", shp], ["flat"])
            n_out = int(rng.choice([3, 8, 13]))
            wname = self._init(
                "gw", rng.normal(0, 0.3, (self.shape[1], n_out)).astype(np.float32)
            )
            bname = self._init("gb", rng.normal(0, 0.2, (n_out,)).astype(np.float32))
            self.w.node("Gemm", ["flat", wname, bname], ["out"])
            out_shape = (1, n_out)
        elif head == "reduce":
            self.w.node(
                "ReduceMean", [self.cur], ["out"], axes=[2, 3], keepdims=1
            )
            out_shape = (1, self.shape[1], 1, 1)
        elif head == "flatten":
            # Transpose NCHW -> NHWC then flatten (the exporters' common
            # tail before landmark heads).
            self.w.node("Transpose", [self.cur], ["tr"], perm=[0, 2, 3, 1])
            n = int(np.prod(self.shape))
            shp = self._init("shp", np.asarray([1, n], np.int64))
            self.w.node("Reshape", ["tr", shp], ["out"])
            out_shape = (1, n)
        else:
            out_shape = tuple(self.shape)
            self.w.node("Relu", [self.cur], ["out"])
        self.w.output("out", out_shape)
        return self.w.serialize()

    def build(self, n_ops: int) -> bytes:
        ops = [
            (self.op_conv, 4), (self.op_act, 3), (self.op_residual, 2),
            (self.op_scale, 1), (self.op_pad, 1), (self.op_pool, 2),
            (self.op_resize, 1), (self.op_concat, 1), (self.op_norm, 2),
            (self.op_slice, 1), (self.op_split, 1),
            (self.op_convtranspose, 1),
        ]
        fns = [f for f, w in ops for _ in range(w)]
        placed = 0
        attempts = 0
        while placed < n_ops and attempts < n_ops * 5:
            attempts += 1
            before = (self.cur, tuple(self.shape))
            fn = fns[int(self.rng.integers(0, len(fns)))]
            if fn():
                placed += 1
                self.seen.append(before)
                # Bound activation growth (resize/concat can explode).
                if np.prod(self.shape) > 64_000:
                    break
        return self.finish()


@pytest.mark.parametrize("seed", range(40))
def test_fuzz_graph_matches_torch_oracle(seed):
    rng = np.random.default_rng(seed)
    gen = GraphGen(rng)
    data = gen.build(n_ops=int(rng.integers(3, 9)))

    x = rng.normal(0, 1, gen.in_shape).astype(np.float32)

    model = load_model(data)
    got = jax.jit(model.apply)(model.params, x)
    got = [np.asarray(o) for o in got]

    want = run_torch(parse_model(data), [x])

    assert len(got) == len(want)
    for g, t in zip(got, want):
        assert g.shape == tuple(t.shape), (g.shape, t.shape)
        np.testing.assert_allclose(g, np.asarray(t), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_graph_nhwc_layout_matches(seed):
    """The NHWC-internal import of the same random graph keeps the ONNX
    I/O contract (onnx/layout.py)."""
    rng = np.random.default_rng(1000 + seed)
    gen = GraphGen(rng)
    data = gen.build(n_ops=int(rng.integers(3, 7)))
    x = rng.normal(0, 1, gen.in_shape).astype(np.float32)

    nchw = load_model(data)
    nhwc = load_model(data, layout="NHWC")
    a = [np.asarray(o) for o in jax.jit(nchw.apply)(nchw.params, x)]
    b = [np.asarray(o) for o in jax.jit(nhwc.apply)(nhwc.params, x)]
    for g, t in zip(a, b):
        assert g.shape == t.shape
        np.testing.assert_allclose(g, t, rtol=1e-4, atol=1e-4)
