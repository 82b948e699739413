"""Round-trip tests for the ONNX wire-format writer (onnx/writer.py) against
the reader (onnx/proto.py) and the importer."""

import numpy as np
import pytest

import jax.numpy as jnp

from zaru_tpu.nn import NeuralNetwork
from zaru_tpu.onnx.proto import parse_model
from zaru_tpu.onnx.writer import OnnxWriter

from stub_models import build_pose_detection_stub, build_pose_landmark_stub


def test_roundtrip_conv_relu():
    rng = np.random.default_rng(0)
    w = OnnxWriter(graph_name="tiny")
    w.input("x", (1, 3, 8, 8))
    kernel = rng.normal(0, 1, (4, 3, 3, 3)).astype(np.float32)
    bias = rng.normal(0, 1, (4,)).astype(np.float32)
    w.initializer("k", kernel)
    w.initializer("b", bias)
    w.node(
        "Conv", ["x", "k", "b"], ["c"],
        kernel_shape=[3, 3], pads=[1, 1, 1, 1], strides=[1, 1],
    )
    w.node("Relu", ["c"], ["y"])
    w.output("y", (1, 4, 8, 8))
    data = w.serialize()

    model = parse_model(data)
    assert model.producer == "zaru_tpu"
    assert model.opset == 13
    assert [n.op_type for n in model.graph.nodes] == ["Conv", "Relu"]
    assert model.graph.nodes[0].attrs["pads"] == [1, 1, 1, 1]
    np.testing.assert_array_equal(model.graph.initializers["k"], kernel)
    assert model.graph.inputs[0].shape == [1, 3, 8, 8]

    # And it actually runs through the importer, matching torch.
    import torch
    import torch.nn.functional as F

    nn = NeuralNetwork.load(data)
    x = rng.normal(0, 1, (1, 3, 8, 8)).astype(np.float32)
    (got,) = nn.estimate(jnp.asarray(x))
    want = F.relu(
        F.conv2d(torch.from_numpy(x), torch.from_numpy(kernel),
                 torch.from_numpy(bias), padding=1)
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_attribute_types_roundtrip():
    w = OnnxWriter()
    w.input("x", (2, 3))
    w.node(
        "Fake", ["x"], ["y"],
        f=1.5, i=-7, s="hello", fs=[1.0, 2.5], ints=[1, -2, 3],
        t=np.arange(6, dtype=np.float32).reshape(2, 3),
    )
    w.output("y", (2, 3))
    g = parse_model(w.serialize()).graph
    a = g.nodes[0].attrs
    assert a["f"] == pytest.approx(1.5)
    assert a["i"] == -7
    assert a["s"] == "hello"
    assert a["fs"] == [1.0, 2.5]
    assert a["ints"] == [1, -2, 3]
    np.testing.assert_array_equal(
        a["t"], np.arange(6, dtype=np.float32).reshape(2, 3)
    )


def test_stub_models_parse_and_run():
    det = parse_model(build_pose_detection_stub())
    assert det.graph.inputs[0].shape == [1, 3, 224, 224]
    assert [o.name for o in det.graph.outputs] == ["boxes", "conf"]

    nn = NeuralNetwork.load(build_pose_landmark_stub(), output_subset=[0, 1])
    x = jnp.zeros((1, 3, 256, 256), jnp.float32)
    lms, flag = nn.estimate(x)
    assert lms.shape == (1, 195)
    assert float(np.asarray(flag).reshape(())) == pytest.approx(0.95)
