"""Fused multi-hand cascade: fixed-shape slot mechanics.

Without hand photo fixtures, detection-driven behavior can't be golden-
tested (same as the reference); these tests exercise the slot machinery —
assignment, dedup, culling, presence-based deactivation — by driving
``step`` pieces directly, plus one full smoke run on noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zaru_tpu.pipeline import MultiHandTracker


@pytest.fixture(scope="module")
def tracker():
    return MultiHandTracker(max_hands=3, detect_interval=5)


def _mk_roi(cx, cy, size=100.0, angle=0.0):
    return jnp.asarray([cx, cy, size, size, angle], jnp.float32)


class TestSlotAssignment:
    def test_assigns_to_free_slots(self, tracker):
        state = tracker.init_state()
        cands = jnp.stack([_mk_roi(100, 100), _mk_roi(300, 300), _mk_roi(500, 100)])
        valid = jnp.asarray([True, True, False])
        rois, active = jax.jit(tracker._assign)(state, cands, valid)
        assert active.tolist() == [True, True, False]
        np.testing.assert_allclose(np.asarray(rois[0]), np.asarray(cands[0]))
        np.testing.assert_allclose(np.asarray(rois[1]), np.asarray(cands[1]))

    def test_dedup_against_active(self, tracker):
        state = tracker.init_state()
        state["rois"] = state["rois"].at[0].set(_mk_roi(100, 100))
        state["active"] = state["active"].at[0].set(True)
        cands = jnp.stack([_mk_roi(105, 100), _mk_roi(400, 400), _mk_roi(0, 0, 1)])
        valid = jnp.asarray([True, True, False])
        rois, active = jax.jit(tracker._assign)(state, cands, valid)
        # Overlapping candidate discarded; far one assigned to slot 1.
        assert active.tolist() == [True, True, False]
        np.testing.assert_allclose(np.asarray(rois[1][:2]), [400, 400])

    def test_no_free_slots(self, tracker):
        state = tracker.init_state()
        for i, c in enumerate([(100, 100), (300, 300), (500, 500)]):
            state["rois"] = state["rois"].at[i].set(_mk_roi(*c))
        state["active"] = jnp.ones(3, bool)
        cands = jnp.stack([_mk_roi(700, 700)] * 3)
        valid = jnp.ones(3, bool)
        rois, active = jax.jit(tracker._assign)(state, cands, valid)
        assert active.tolist() == [True, True, True]
        np.testing.assert_allclose(np.asarray(rois[2][:2]), [500, 500])


class TestFusedHandStep:
    def test_noise_smoke(self, tracker):
        """Full step on noise: no hands expected, shapes fixed, no crash."""
        rng = np.random.default_rng(0)
        frame = jnp.asarray(rng.integers(0, 256, (240, 320, 4), np.uint8))
        state = tracker.init_state()
        for _ in range(3):
            state, out = tracker.run_frame(state, frame)
        assert out["landmarks"].shape == (3, 21, 3)
        assert out["valid"].shape == (3,)

    def test_detect_scheduling(self, tracker):
        """Frame counter advances; detection cadence is data-independent
        code, validated through the traced `do_detect` predicate."""
        state = tracker.init_state()
        frame = jnp.zeros((120, 160, 4), jnp.uint8)
        for i in range(3):
            state, out = tracker.run_frame(state, frame)
            assert int(state["frame"]) == i + 1

    def test_batched(self, tracker):
        rng = np.random.default_rng(1)
        frames = jnp.asarray(rng.integers(0, 256, (2, 120, 160, 4), np.uint8))
        state = tracker.init_state(batch=2)
        state, out = tracker.run_frames(state, frames)
        assert out["landmarks"].shape == (2, 3, 21, 3)

    def test_gated_batched(self, tracker):
        """Batch-level gate + MXU fast sampling (step_batch): fixed shapes,
        output renames applied, frame counters advance."""
        rng = np.random.default_rng(2)
        frames = jnp.asarray(rng.integers(0, 256, (2, 120, 160, 4), np.uint8))
        state = tracker.init_state(batch=2)
        for i in range(2):
            state, out = tracker.run_frames_gated(state, frames)
            assert np.asarray(state["frame"]).tolist() == [i + 1, i + 1]
        assert out["landmarks"].shape == (2, 3, 21, 3)
        assert "presence" in out and "handedness" in out
        assert "confidence" not in out
