"""Spec-semantics regressions for ONNX paths the bundled models never
exercise (round-5 review findings): auto_pad edge placement, old-opset
Softmax, floor-based Resize sizing, negative Flatten axis, omitted
optional inputs, and honest unsupported-config errors.

Each case builds a tiny graph with zaru_tpu.onnx.writer and checks the
lowered JAX output against independently computed expectations (numpy, or
an equivalent explicit-attribute graph)."""

import numpy as np
import pytest

from zaru_tpu.onnx import load_model
from zaru_tpu.onnx.writer import OnnxWriter


def _run(data, *inputs):
    import jax

    m = load_model(data)
    outs = jax.jit(m.apply)(m.params, *inputs)
    return [np.asarray(o) for o in outs]


def _conv_model(auto_pad=None, pads=None, opset=13):
    w = OnnxWriter(graph_name="t", opset=opset)
    w.input("x", (1, 1, 5, 5))
    w.initializer("w", np.ones((1, 1, 2, 2), np.float32))
    attrs = {"kernel_shape": [2, 2], "strides": [1, 1]}
    if auto_pad is not None:
        attrs["auto_pad"] = auto_pad
    if pads is not None:
        attrs["pads"] = pads
    w.node("Conv", ["x", "w"], ["y"], **attrs)
    w.output("y", (1, 1, 5, 5))
    return w.serialize()


class TestAutoPad:
    def test_conv_same_lower_places_odd_pad_at_begin(self):
        """SAME_LOWER with k=2,s=1 needs total pad 1: ONNX puts it at the
        BEGIN edge — equivalent to explicit pads [1,1,0,0]."""
        x = np.arange(25, dtype=np.float32).reshape(1, 1, 5, 5)
        (lower,) = _run(_conv_model(auto_pad="SAME_LOWER"), x)
        (explicit,) = _run(_conv_model(pads=[1, 1, 0, 0]), x)
        np.testing.assert_allclose(lower, explicit, rtol=1e-6)
        # And it must NOT equal SAME_UPPER (pads at the end).
        (upper,) = _run(_conv_model(auto_pad="SAME_UPPER"), x)
        assert not np.allclose(lower, upper)

    def test_maxpool_same_upper_matches_explicit(self):
        """Pools must honor auto_pad like Conv does (TF-converted models):
        k=2,s=2 on a 5-wide input → out ceil(5/2)=3, end-padded."""
        x = np.arange(25, dtype=np.float32).reshape(1, 1, 5, 5)

        def pool_model(**attrs):
            w = OnnxWriter(graph_name="t")
            w.input("x", (1, 1, 5, 5))
            w.node("MaxPool", ["x"], ["y"], kernel_shape=[2, 2],
                   strides=[2, 2], **attrs)
            w.output("y", (1, 1, 3, 3))
            return w.serialize()

        (auto,) = _run(pool_model(auto_pad="SAME_UPPER"), x)
        (explicit,) = _run(pool_model(pads=[0, 0, 1, 1]), x)
        assert auto.shape == (1, 1, 3, 3)
        np.testing.assert_allclose(auto, explicit)

    def test_convtranspose_auto_pad_raises(self):
        w = OnnxWriter(graph_name="t")
        w.input("x", (1, 1, 4, 4))
        w.initializer("w", np.ones((1, 1, 2, 2), np.float32))
        w.node("ConvTranspose", ["x", "w"], ["y"], kernel_shape=[2, 2],
               strides=[2, 2], auto_pad="SAME_UPPER")
        w.output("y", (1, 1, 8, 8))
        with pytest.raises(NotImplementedError, match="auto_pad"):
            _run(w.serialize(), np.zeros((1, 1, 4, 4), np.float32))


class TestOpsetSemantics:
    def test_softmax_opset11_flattens_trailing_dims(self):
        """Opset < 13: default axis 1 and softmax over the FLATTENED
        [axis:] dims — one joint distribution per sample."""
        x = np.random.default_rng(0).normal(size=(2, 3, 4)).astype(np.float32)
        w = OnnxWriter(graph_name="t", opset=11)
        w.input("x", (2, 3, 4))
        w.node("Softmax", ["x"], ["y"])
        w.output("y", (2, 3, 4))
        (got,) = _run(w.serialize(), x)
        flat = x.reshape(2, -1)
        e = np.exp(flat - flat.max(axis=1, keepdims=True))
        want = (e / e.sum(axis=1, keepdims=True)).reshape(x.shape)
        np.testing.assert_allclose(got, want, rtol=1e-5)
        # Each sample's joint distribution sums to 1 (not each row).
        np.testing.assert_allclose(got.reshape(2, -1).sum(axis=1), 1.0,
                                   rtol=1e-5)

    def test_softmax_opset13_is_per_axis(self):
        x = np.random.default_rng(0).normal(size=(2, 3, 4)).astype(np.float32)
        w = OnnxWriter(graph_name="t", opset=13)
        w.input("x", (2, 3, 4))
        w.node("Softmax", ["x"], ["y"])
        w.output("y", (2, 3, 4))
        (got,) = _run(w.serialize(), x)
        np.testing.assert_allclose(got.sum(axis=-1), np.ones((2, 3)),
                                   rtol=1e-5)


class TestShapeSemantics:
    def test_resize_fractional_scale_floors(self):
        """Spec: out dim = floor(scale*dim) — 7*0.5 → 3, not round's 4."""
        x = np.arange(49, dtype=np.float32).reshape(1, 1, 7, 7)
        w = OnnxWriter(graph_name="t")
        w.input("x", (1, 1, 7, 7))
        w.initializer("roi", np.zeros((0,), np.float32))
        w.initializer("scales", np.asarray([1, 1, 0.5, 0.5], np.float32))
        w.node("Resize", ["x", "roi", "scales"], ["y"], mode="nearest",
               coordinate_transformation_mode="asymmetric",
               nearest_mode="floor")
        w.output("y", (1, 1, 3, 3))
        (got,) = _run(w.serialize(), x)
        assert got.shape == (1, 1, 3, 3)

    def test_flatten_negative_axis(self):
        x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        w = OnnxWriter(graph_name="t")
        w.input("x", (2, 3, 4))
        w.node("Flatten", ["x"], ["y"], axis=-1)
        w.output("y", (6, 4))
        (got,) = _run(w.serialize(), x)
        assert got.shape == (6, 4)
        np.testing.assert_array_equal(got, x.reshape(6, 4))

    def test_reduce_mean_omitted_optional_axes_reduces_all(self):
        """ONNX spells an omitted optional input as the empty name;
        the handler must not demand a static tensor for it."""
        x = np.arange(12, dtype=np.float32).reshape(3, 4)
        w = OnnxWriter(graph_name="t", opset=18)
        w.input("x", (3, 4))
        w.node("ReduceMean", ["x", ""], ["y"], keepdims=0)
        w.output("y", ())
        (got,) = _run(w.serialize(), x)
        np.testing.assert_allclose(got, x.mean(), rtol=1e-6)
