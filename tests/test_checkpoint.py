"""Checkpoint save/restore of fine-tuned params."""

import numpy as np
import pytest

import jax.numpy as jnp

from zaru_tpu.assets import model_path
from zaru_tpu.checkpoint import load_params, save_params
from zaru_tpu.onnx import load_model


@pytest.fixture(scope="module")
def model():
    return load_model(model_path("slim_160_latest.onnx"))


def test_npz_roundtrip(tmp_path, model):
    p = tmp_path / "weights.npz"
    save_params(p, model.params)
    restored = load_params(p)
    assert set(restored) == set(model.params)
    for k in model.params:
        np.testing.assert_array_equal(restored[k], np.asarray(model.params[k]))


def test_finetuned_weights_roundtrip(tmp_path, model):
    """Train a step, save, reload, verify outputs match the trained model."""
    import jax

    from zaru_tpu.train import Trainer

    trainer = Trainer(model)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, 3, 160, 160)).astype(np.float32)
    y = rng.uniform(0, 1, (1, 143)).astype(np.float32)
    trainer.train_step(x, y)

    p = tmp_path / "tuned.npz"
    save_params(p, trainer.params)
    restored = load_params(p)

    out_a = jax.jit(model.apply)(trainer.params, jnp.asarray(x))[0]
    out_b = jax.jit(model.apply)(restored, jnp.asarray(x))[0]
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    # And differ from the pretrained weights.
    out_c = jax.jit(model.apply)(model.params, jnp.asarray(x))[0]
    assert float(jnp.abs(out_a - out_c).max()) > 0


def test_orbax_roundtrip(tmp_path, model):
    p = tmp_path / "ckpt"
    try:
        save_params(p, model.params)
    except Exception as e:  # pragma: no cover - orbax config varies
        pytest.skip(f"orbax unavailable in this environment: {e}")
    restored = load_params(p)
    for k in model.params:
        np.testing.assert_array_equal(
            np.asarray(restored[k]), np.asarray(model.params[k])
        )
