"""Bounded (bucketed) redetection on the gated batch path.

With ``FaceTracker(redetect_bucket=K)``, an unforced detection frame
detects only the first K lost streams (static shapes) instead of the
whole batch — bounding the gate's worst-case frame cost at detector(K)
— while the forced production cadence still redetects every stream
(reference cadence semantics: hand/tracking.rs:41).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zaru_tpu.pipeline import FaceTracker


@pytest.fixture(scope="module")
def tracker():
    return FaceTracker(smooth=None, redetect_bucket=2)


@pytest.fixture(scope="module")
def frame(sad_linus_full):
    return sad_linus_full.data


def test_bucket_drains_lost_streams_k_per_frame(tracker, frame):
    """From all-lost, an unforced step acquires exactly K streams; the
    rest drain on subsequent frames."""
    batch = 5
    frames = jnp.stack([frame] * batch)
    state = tracker.init_state(batch=batch)

    state, out = tracker.run_frames_gated(state, frames)
    assert int(np.asarray(out["valid"]).sum()) == 2
    state, out = tracker.run_frames_gated(state, frames)
    assert int(np.asarray(out["valid"]).sum()) == 4
    state, out = tracker.run_frames_gated(state, frames)
    assert int(np.asarray(out["valid"]).sum()) == 5
    # Steady state: everyone keeps tracking on the keep branch.
    state, out = tracker.run_frames_gated(state, frames)
    assert bool(np.asarray(out["valid"]).all())


def test_bucket_recovery_matches_full_redetect(tracker, frame):
    """One stream drops, then recovers: the bucketed branch must produce
    BIT-IDENTICAL results to the all-streams detect branch — the tracked
    streams' ROIs are carried either way, and the lost stream's detector
    seed comes from the same per-stream detection (a K=2 bucket and the
    full pass see the same frame content). This pins that the
    gather/scatter introduces no perturbation at all (consecutive-step
    landmark COMPARISONS would not: the unsmoothed track loop itself
    oscillates ~2-4 px/step while converging on a static photo)."""
    control = FaceTracker(smooth=None)  # redetect_bucket=None
    batch = 4
    frames = jnp.stack([frame] * batch)
    frames_lost = frames.at[1].set(0)

    outs = []
    for t in (tracker, control):
        state = t.init_state(batch=batch)
        # Seed EVERY stream with one forced (all-streams) detection so
        # both arms' streams sit at the same track-convergence phase —
        # unforced bucket warmup would seed only K streams/frame,
        # desynchronizing the late streams' convergence from the control.
        forced = jax.jit(
            lambda p, s, f: t.step_batch(p, s, f, force_detect=True)
        )
        state, out = forced(t.params, state, frames)
        for _ in range(2):
            state, out = t.run_frames_gated(state, frames)
        assert bool(np.asarray(out["valid"]).all())
        # Stream 1 sees a blank frame and is lost at the NEXT step's gate.
        state, out = t.run_frames_gated(state, frames_lost)
        valid = np.asarray(out["valid"])
        assert valid[0] and valid[2] and valid[3] and not valid[1]
        # Recovery step: the detect branch runs (bucket vs full).
        state, out = t.run_frames_gated(state, frames)
        assert bool(np.asarray(out["valid"]).all())
        outs.append(out)

    for key in ("landmarks", "roi", "confidence"):
        a, b = np.asarray(outs[0][key]), np.asarray(outs[1][key])
        assert np.array_equal(a, b), (
            f"bucketed recovery diverged from full redetect on {key}: "
            f"max diff {np.abs(a - b).max()}"
        )


def test_forced_cadence_still_detects_all(frame):
    """force_detect bypasses the bucket: all lost streams acquire in one
    forced step even with a K=1 bucket."""
    tracker = FaceTracker(smooth=None, redetect_bucket=1)
    batch = 3
    frames = jnp.stack([frame] * batch)
    state = tracker.init_state(batch=batch)
    state, out = tracker.step_batch(
        tracker.params, state, frames, force_detect=True
    )
    assert bool(np.asarray(out["valid"]).all())


def test_bucket_larger_than_batch_clamps(frame):
    tracker = FaceTracker(smooth=None, redetect_bucket=64)
    batch = 2
    frames = jnp.stack([frame] * batch)
    state = tracker.init_state(batch=batch)
    state, out = tracker.run_frames_gated(state, frames)
    assert bool(np.asarray(out["valid"]).all())


# --- multi-object engine (MultiObjectTracker.step_batch) -------------------


def test_multi_object_bucket_drains_and_matches_full(frame):
    """The slot engine's bucket: a loss-triggered detection frame detects
    only K lost streams; interval/forced redetects still run everyone
    (skipping one would MISS — not delay — that stream's periodic
    redetect). Recovery of the bucketed stream is bit-identical to the
    all-streams branch."""
    from zaru_tpu.pipeline import MultiFaceTracker

    batch = 3
    frames = jnp.stack([frame] * batch)
    frames_lost = frames.at[1].set(0)

    outs = []
    for bucket in (1, None):
        # detect_interval hits at frame 0 only (seeds every stream at
        # once through the full branch in BOTH arms), never again
        # within the test horizon.
        t = MultiFaceTracker(
            max_faces=2, detect_interval=10**6, redetect_bucket=bucket
        )
        state = t.init_state(batch=batch)
        state, out = t.run_frames_gated(state, frames)  # interval seed
        assert bool(np.asarray(out["valid"]).any(axis=1).all())
        state, out = t.run_frames_gated(state, frames)  # steady keep
        # Stream 1 blanks: its slots lose presence.
        state, out = t.run_frames_gated(state, frames_lost)
        tracked = np.asarray(out["valid"]).any(axis=1)
        assert tracked[0] and tracked[2] and not tracked[1]
        # Recovery: loss-triggered detect (bucket of 1 vs all streams).
        state, out = t.run_frames_gated(state, frames)
        assert bool(np.asarray(out["valid"]).any(axis=1).all())
        outs.append(out)

    for key in ("landmarks", "confidence"):
        a, b = np.asarray(outs[0][key]), np.asarray(outs[1][key])
        assert np.array_equal(a, b), (
            f"slot-engine bucketed recovery diverged on {key}: "
            f"max diff {np.abs(a - b).max()}"
        )
