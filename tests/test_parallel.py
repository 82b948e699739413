"""Multi-device sharding tests on the 8-way virtual CPU mesh
(conftest sets xla_force_host_platform_device_count=8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def mesh():
    from zaru_tpu.parallel import stream_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return stream_mesh(jax.devices()[:8])


def test_sharded_face_tracker(mesh, sad_linus_full):
    from zaru_tpu.parallel import ShardedFaceTracker
    from zaru_tpu.pipeline import FaceTracker

    tracker = FaceTracker()
    sharded = ShardedFaceTracker(tracker, mesh)
    batch = 8
    state = sharded.init_state(batch)
    frames = sharded.shard_frames(jnp.stack([sad_linus_full.data] * batch))
    state, out = sharded.step(state, frames)
    assert out["landmarks"].shape == (batch, 468, 3)
    assert bool(np.asarray(out["valid"]).all())
    # Results identical to the unsharded batched tracker.
    ref_state = tracker.init_state(batch=batch)
    _, ref_out = tracker.run_frames(ref_state, jnp.stack([sad_linus_full.data] * batch))
    np.testing.assert_allclose(
        np.asarray(out["landmarks"]), np.asarray(ref_out["landmarks"]), atol=1e-3
    )


def test_sharded_gated_fast_path(mesh, sad_linus_full):
    """Per-shard batch gate + MXU fast sampler under shard_map: agrees with
    the unsharded gated tracker."""
    from zaru_tpu.parallel import ShardedFaceTracker
    from zaru_tpu.pipeline import FaceTracker

    tracker = FaceTracker(smooth=None)
    sharded = ShardedFaceTracker(tracker, mesh)
    batch = 8
    frames_np = jnp.stack([sad_linus_full.data] * batch)
    state = sharded.init_state(batch)
    frames = sharded.shard_frames(frames_np)
    for _ in range(2):
        state, out = sharded.step_gated(state, frames)
    assert bool(np.asarray(out["valid"]).all())

    ref_state = tracker.init_state(batch=batch)
    for _ in range(2):
        ref_state, ref_out = tracker.run_frames_gated(ref_state, frames_np)
    # Shard-local (batch-1) vs global (batch-8) compilation reassociates
    # conv/sampler reductions; agreement is numeric (~1e-2 px), not
    # bitwise — far inside the 1 px parity budget.
    np.testing.assert_allclose(
        np.asarray(out["landmarks"]), np.asarray(ref_out["landmarks"]), atol=5e-2
    )


def test_sharded_redetect_bucket_is_per_shard(mesh, sad_linus_full):
    """Under stream sharding the bounded-redetect bucket is SHARD-LOCAL:
    each chip drains K of its own lost streams per frame (worst-case
    frame cost detector(K) per chip, no collectives). From all-lost,
    16 streams over 8 shards with K=1 acquire 8 per frame."""
    from zaru_tpu.parallel import ShardedFaceTracker
    from zaru_tpu.pipeline import FaceTracker

    tracker = FaceTracker(smooth=None, redetect_bucket=1)
    sharded = ShardedFaceTracker(tracker, mesh)
    batch = 16
    state = sharded.init_state(batch)
    frames = sharded.shard_frames(jnp.stack([sad_linus_full.data] * batch))
    state, out = sharded.step_gated(state, frames)
    assert int(np.asarray(out["valid"]).sum()) == 8
    state, out = sharded.step_gated(state, frames)
    assert int(np.asarray(out["valid"]).sum()) == 16


def test_uneven_batch_rejected(mesh):
    from zaru_tpu.parallel import ShardedFaceTracker
    from zaru_tpu.pipeline import FaceTracker

    sharded = ShardedFaceTracker(FaceTracker(), mesh)
    with pytest.raises(AssertionError, match="divide evenly"):
        sharded.init_state(9)


def test_data_parallel_training(mesh):
    from zaru_tpu.assets import model_path
    from zaru_tpu.onnx import load_model
    from zaru_tpu.train import make_data_parallel_train_step

    model = load_model(model_path("slim_160_latest.onnx"))
    step, params, opt_state, shard_batch = make_data_parallel_train_step(model, mesh)
    rng = np.random.default_rng(0)
    x = shard_batch(rng.uniform(-1, 1, size=(8, 3, 160, 160)).astype(np.float32))
    y = shard_batch(rng.uniform(0, 1, size=(8, 143)).astype(np.float32))
    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state, x, y)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses


def test_single_process_trainer():
    from zaru_tpu.assets import model_path
    from zaru_tpu.onnx import load_model
    from zaru_tpu.train import Trainer

    model = load_model(model_path("landmarks_68_pfld.onnx"))
    trainer = Trainer(model)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(1, 3, 112, 112)).astype(np.float32)
    y = rng.uniform(0, 1, size=(1, 136)).astype(np.float32)
    l0 = trainer.train_step(x, y)
    for _ in range(4):
        l = trainer.train_step(x, y)
    assert l < l0


def test_graft_entry_single():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    state, outputs = out
    assert outputs["landmarks"].shape == (468, 3)


def test_sharded_slot_tracker(mesh, sad_linus_full):
    """ShardedTracker generalizes to the slot engines: a MultiFaceTracker
    shards its streams over the mesh, each chip running its shard's slots,
    and agrees with the unsharded gated tracker."""
    from zaru_tpu.parallel import ShardedTracker
    from zaru_tpu.pipeline import MultiFaceTracker

    tracker = MultiFaceTracker(max_faces=2)
    sharded = ShardedTracker(tracker, mesh)
    batch = 8
    frames_np = jnp.stack([sad_linus_full.data] * batch)
    state = sharded.init_state(batch)
    frames = sharded.shard_frames(frames_np)
    for _ in range(2):
        state, out = sharded.step_gated(state, frames)
    v = np.asarray(out["valid"])
    assert v.shape == (batch, 2)
    assert bool(v[:, 0].all())  # slot 0 tracks the one face in every stream

    ref_state = tracker.init_state(batch=batch)
    for _ in range(2):
        ref_state, ref_out = tracker.run_frames_gated(ref_state, frames_np)
    np.testing.assert_array_equal(v, np.asarray(ref_out["valid"]))
    np.testing.assert_allclose(
        np.asarray(out["landmarks"])[:, 0],
        np.asarray(ref_out["landmarks"])[:, 0],
        atol=5e-2,
    )


def test_uploader_stages_into_stream_sharding(mesh, sad_linus_full):
    """FrameUploader(device=frame_sharding) lands frames already in the
    stream-sharded layout, so step_gated consumes the upload buffer with
    no second device_put (ADVICE r4: serve --shard double transfer)."""
    from zaru_tpu.parallel import ShardedTracker
    from zaru_tpu.pipeline import FaceTracker
    from zaru_tpu.pipeline.ingest import FrameUploader

    tracker = FaceTracker()
    sharded = ShardedTracker(tracker, mesh)
    frame = np.asarray(sad_linus_full.data)
    batch = 8
    up = FrameUploader(
        batch=batch, shape=frame.shape, device=sharded.frame_sharding
    )
    for slot in range(batch):
        up.stage(slot, frame)
    frames_dev = up.flush()
    assert frames_dev.sharding == sharded.frame_sharding
    state = sharded.init_state(batch)
    state, out = sharded.step_gated(state, frames_dev)
    assert bool(np.asarray(out["valid"]).all())


def test_shard_state_replaces_host_edited_state(mesh, sad_linus_full):
    """reset_state_slots surgery + shard_state round-trips a join reset
    onto the mesh (the serve join/leave path)."""
    from zaru_tpu.parallel import ShardedTracker
    from zaru_tpu.pipeline import FaceTracker
    from zaru_tpu.serve import reset_state_slots

    tracker = FaceTracker()
    sharded = ShardedTracker(tracker, mesh)
    batch = 8
    frames = sharded.shard_frames(
        jnp.stack([sad_linus_full.data] * batch)
    )
    state = sharded.init_state(batch)
    state, out = sharded.step_gated(state, frames)
    assert bool(np.asarray(out["valid"]).all())
    fresh = tracker.init_state(batch=batch)
    state = sharded.shard_state(reset_state_slots(state, fresh, [3]))
    tr = np.asarray(state["tracking"])
    assert not tr[3] and tr[[0, 1, 2, 4, 5, 6, 7]].all()
    # The reset stream redetects on the next gated step.
    state, out = sharded.step_gated(state, frames)
    assert bool(np.asarray(out["valid"]).all())
