"""ONNX importer validation.

Strategy (SURVEY.md §4): every bundled model is executed through the JAX
importer AND through an independently written torch oracle (tests/torch_ref),
on the same random input; outputs must agree to f32 accumulation tolerance.
This replaces golden outputs from the reference's CPU ONNX runtimes, which
are unavailable here.
"""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zaru_tpu.onnx import load_model, parse_model
from zaru_tpu.assets import model_path

MODELS = [
    "face_detection_short_range.onnx",
    "face_detection_full_range.onnx",
    "face_landmark.onnx",
    "face_landmarks_detector.onnx",
    "hand_landmark_lite.onnx",
    "iris_landmark.onnx",
    "landmarks_68_pfld.onnx",
    "mobilefacenet.onnx",
    "palm_detection_lite.onnx",
    "slim_160_latest.onnx",
]


def _random_inputs(m, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for vi in m.input_info:
        shape = [d if isinstance(d, int) else 1 for d in vi.shape]
        # Image-range input, [-1, 1] like the CNN color mappers use.
        out.append(rng.uniform(-1.0, 1.0, size=shape).astype(np.float32))
    return out


@pytest.mark.parametrize("name", MODELS)
def test_model_matches_torch_oracle(name):
    from torch_ref import run_torch

    path = model_path(name)
    data = path.read_bytes()
    model = parse_model(data)
    imported = load_model(data)
    xs = _random_inputs(imported)

    ours = jax.jit(imported.apply)(imported.params, *[jnp.asarray(x) for x in xs])
    ref = run_torch(model, xs)

    assert len(ours) == len(ref)
    for i, (a, b) in enumerate(zip(ours, ref)):
        a = np.asarray(a)
        assert a.shape == b.shape, f"output {i} shape {a.shape} vs {b.shape}"
        # f32 conv accumulation order differs between XLA and torch; allow
        # small mixed abs/rel slack scaled by output magnitude.
        tol = 1e-3 * max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, atol=tol, rtol=2e-3, err_msg=f"output {i}")


def test_all_assets_parse():
    for name in MODELS:
        m = parse_model(model_path(name).read_bytes())
        assert m.graph.nodes, name


def test_output_subset_selection():
    """Mirrors reference Loader::with_output_selection (nn/mod.rs:286-300)."""
    data = model_path("face_landmarks_detector.onnx").read_bytes()
    full = load_model(data)
    assert full.num_outputs == 3
    sub = load_model(data, output_subset=[full.output_info[1].name])
    assert sub.num_outputs == 1
    xs = _random_inputs(full)
    a = jax.jit(sub.apply)(sub.params, *[jnp.asarray(x) for x in xs])
    b = jax.jit(full.apply)(full.params, *[jnp.asarray(x) for x in xs])
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[1]), rtol=1e-5, atol=1e-5)


def test_bfloat16_compute_mode():
    data = model_path("face_detection_short_range.onnx").read_bytes()
    f32 = load_model(data)
    bf16 = load_model(data, compute_dtype=jnp.bfloat16)
    xs = _random_inputs(f32)
    a = jax.jit(f32.apply)(f32.params, *[jnp.asarray(x) for x in xs])
    b = jax.jit(bf16.apply)(bf16.params, *[jnp.asarray(x) for x in xs])
    for x, y in zip(a, b):
        assert y.dtype == jnp.float32  # outputs cast back
        # bf16 has ~3 decimal digits; raw logits are O(100) here.
        scale = max(1.0, float(jnp.abs(x).max()))
        assert float(jnp.abs(x - y).max()) < 0.05 * scale


def test_params_are_trainable_pytree():
    data = model_path("slim_160_latest.onnx").read_bytes()
    m = load_model(data)
    leaves = jax.tree_util.tree_leaves(m.params)
    assert all(l.dtype == np.float32 for l in leaves)
    assert sum(l.size for l in leaves) > 10_000

    def loss(p, x):
        return jnp.sum(m.apply(p, x)[0] ** 2)

    g = jax.grad(loss)(m.params, jnp.zeros((1, 3, 160, 160), jnp.float32))
    gl = jax.tree_util.tree_leaves(g)
    assert any(bool(jnp.any(l != 0)) for l in gl)
