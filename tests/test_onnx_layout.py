"""NHWC internal-layout mode (onnx/layout.py): numeric parity with the
NCHW-native import across bundled models, and conversion-count sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zaru_tpu.assets import model_path
from zaru_tpu.onnx import load_model

MODELS = [
    # (file, input shape)
    ("face_detection_short_range.onnx", (1, 3, 128, 128)),
    ("face_landmark.onnx", (1, 3, 192, 192)),
    ("face_landmarks_detector.onnx", (1, 3, 256, 256)),
    ("iris_landmark.onnx", (1, 3, 64, 64)),
    ("palm_detection_lite.onnx", (1, 3, 192, 192)),
    ("slim_160_latest.onnx", (1, 3, 160, 160)),
]


@pytest.mark.parametrize("name,shape", MODELS)
def test_nhwc_matches_nchw(name, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))

    nchw = load_model(model_path(name))
    nhwc = load_model(model_path(name), layout="NHWC")
    outs_a = jax.jit(nchw.apply)(nchw.params, x)
    outs_b = jax.jit(nhwc.apply)(nhwc.params, x)
    assert len(outs_a) == len(outs_b)
    for a, b in zip(outs_a, outs_b):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-4)

    # apply_nhwc accepts the image already in NHWC (transpose-free feed).
    x_hwc = jnp.transpose(x, (0, 2, 3, 1))
    outs_c = jax.jit(nhwc.apply_nhwc)(nhwc.params, x_hwc)
    for b, c in zip(outs_b, outs_c):
        np.testing.assert_allclose(np.asarray(b), np.asarray(c), atol=1e-6)


def test_nhwc_inserts_few_conversions():
    """The layout tags must propagate: materialization (explicit transpose)
    happens only at genuine boundaries, not per node."""
    name, shape = MODELS[0]
    nhwc = load_model(model_path(name), layout="NHWC")
    x = jnp.zeros(shape, jnp.float32)
    jaxpr = jax.make_jaxpr(nhwc.apply)(nhwc.params, x)
    n_transpose = sum(
        1 for eqn in jaxpr.jaxpr.eqns if eqn.primitive.name == "transpose"
    )
    n_conv = sum(
        1
        for eqn in jaxpr.jaxpr.eqns
        if eqn.primitive.name == "conv_general_dilated"
    )
    assert n_conv >= 10  # it's a real CNN
    # The pre-head NCHW→NHWC transposes collapse to identities and only
    # the entry conversion remains.
    assert n_transpose <= 2, n_transpose
