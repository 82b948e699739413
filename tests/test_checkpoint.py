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


def test_async_save(tmp_path, model):
    from zaru_tpu.checkpoint import save_params_async

    p = tmp_path / "async_ckpt"
    try:
        h = save_params_async(p, model.params)
    except Exception as e:  # pragma: no cover - orbax config varies
        pytest.skip(f"orbax unavailable in this environment: {e}")
    h.wait_until_finished()
    restored = load_params(p)
    for k in model.params:
        np.testing.assert_array_equal(
            np.asarray(restored[k]), np.asarray(model.params[k])
        )


def test_checkpoint_manager_retention_and_restore(tmp_path, model):
    from zaru_tpu.checkpoint import CheckpointManager

    params = {k: np.asarray(v) for k, v in model.params.items()}
    first = sorted(params)[0]
    try:
        with CheckpointManager(tmp_path / "mgr", max_to_keep=2) as mgr:
            for step in range(4):
                stepped = dict(params, **{first: params[first] + step})
                assert mgr.save(step, stepped)
            mgr.wait_until_finished()
            assert mgr.all_steps() == [2, 3]  # retention pruned 0, 1
            assert mgr.latest_step() == 3
            restored = mgr.restore()
            np.testing.assert_array_equal(restored[first], params[first] + 3)
            restored2 = mgr.restore(step=2)
            np.testing.assert_array_equal(restored2[first], params[first] + 2)
    except Exception as e:  # pragma: no cover - orbax config varies
        pytest.skip(f"orbax unavailable in this environment: {e}")


def test_sharded_save_restore_on_mesh(tmp_path, model):
    """Distributed checkpointing: params placed on an 8-device mesh save
    through orbax and restore DIRECTLY with a target sharding (``like=``),
    no host round trip — the multi-chip training resume path."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zaru_tpu.checkpoint import CheckpointManager
    from zaru_tpu.parallel import stream_mesh

    mesh = stream_mesh()
    replicated = NamedSharding(mesh, P())
    placed = {k: jax.device_put(v, replicated) for k, v in model.params.items()}
    # Shard the largest weight over the mesh axis (a real distributed
    # leaf, not just replicas), picking an axis divisible by the mesh.
    n = mesh.devices.size
    shardable = [
        k
        for k, v in placed.items()
        if v.ndim > 0 and v.shape[0] % n == 0 and v.size > n
    ]
    key = max(shardable, key=lambda k: placed[k].size)
    placed[key] = jax.device_put(
        model.params[key], NamedSharding(mesh, P("stream"))
    )

    try:
        with CheckpointManager(tmp_path / "mesh_ckpt") as mgr:
            assert mgr.save(0, placed)
            mgr.wait_until_finished()
            restored = mgr.restore(0, like=placed)
    except Exception as e:  # pragma: no cover - orbax config varies
        pytest.skip(f"orbax sharded save unavailable: {e}")

    assert restored[key].sharding == placed[key].sharding
    for k in placed:
        np.testing.assert_array_equal(
            np.asarray(restored[k]), np.asarray(model.params[k])
        )
