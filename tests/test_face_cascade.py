"""Fused cascade tests: the single-jit detect→track→smooth step must
reproduce the host-API tracker's behavior on the fixture photo, run batched
over a stream axis, and handle loss/reacquire."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zaru_tpu.filters import OneEuroFilter
from zaru_tpu.image import Image
from zaru_tpu.pipeline import FaceTracker


@pytest.fixture(scope="module")
def tracker():
    return FaceTracker(smooth=OneEuroFilter(min_cutoff=1.0, beta=0.5))


@pytest.fixture(scope="module")
def frame(sad_linus_full):
    return sad_linus_full.data


class TestFusedCascade:
    def test_detect_seed_track(self, tracker, frame, sad_linus_full):
        state = tracker.init_state()
        state, out = tracker.run_frame(state, frame)
        assert bool(out["valid"])
        assert float(out["confidence"]) > 0.9
        assert bool(state["tracking"])

        # Landmarks must be plausible face coordinates inside the photo.
        pos = np.asarray(out["landmarks"])
        assert pos.shape == (468, 3)
        w, h = sad_linus_full.width(), sad_linus_full.height()
        assert (pos[:, 0] > 0).all() and (pos[:, 0] < w).all()
        assert (pos[:, 1] > 0).all() and (pos[:, 1] < h).all()

    def test_matches_host_tracker(self, frame, sad_linus_full):
        """Fused landmarks within ~1.5px of the host-API pipeline (both run
        the same models, unsmoothed; tiny drift from averaged-NMS seeding
        order)."""
        from zaru_tpu.detection import Detector
        from zaru_tpu.face.detection import ShortRangeNetwork
        from zaru_tpu.face.landmark.mediapipe import FaceMeshV1
        from zaru_tpu.landmark import Estimator, LandmarkTracker

        raw_tracker = FaceTracker(smooth=None)
        state = raw_tracker.init_state()
        for _ in range(3):
            state, out = raw_tracker.run_frame(state, frame)
        fused = np.asarray(out["landmarks"])[:, :2]

        det = Detector(ShortRangeNetwork())
        best = max(det.detect(sad_linus_full), key=lambda d: d.confidence())
        host_tracker = LandmarkTracker(Estimator(FaceMeshV1()))
        host_tracker.set_roi(best.bounding_rect())
        for _ in range(3):
            result = host_tracker.track(sad_linus_full)
        host = result.estimate().landmarks_mut().positions()[:, :2]

        err = np.abs(fused - host).max()
        assert err < 1.5, f"max landmark deviation {err}px"

    def test_loss_and_reacquire(self, tracker, frame):
        state = tracker.init_state()
        state, out = tracker.run_frame(state, frame)
        assert bool(out["valid"])

        blank = jnp.zeros_like(frame)
        state, out = tracker.run_frame(state, blank)
        assert not bool(out["valid"])
        assert not bool(state["tracking"])

        state, out = tracker.run_frame(state, frame)
        assert bool(out["valid"])

    def test_batched_streams(self, tracker, frame):
        batch = 4
        frames = jnp.stack([frame] * batch)
        state = tracker.init_state(batch=batch)
        state, out = tracker.run_frames(state, frames)
        assert out["landmarks"].shape == (batch, 468, 3)
        assert bool(jnp.all(out["valid"]))
        # Stream 2 loses the face; others keep tracking.
        frames2 = frames.at[2].set(0)
        state, out = tracker.run_frames(state, frames2)
        valid = np.asarray(out["valid"])
        assert valid[0] and valid[1] and valid[3] and not valid[2]

    def test_gated_batch_fast_sampler_matches_exact(self, frame):
        """The gated serving path (batch gate + MXU fast sampler) must stay
        within the 1 px parity budget of the exact per-stream path
        (BASELINE.json) and handle loss/redetect/forced detection."""
        batch = 2
        frames = jnp.stack([frame] * batch)

        fast = FaceTracker(smooth=None)  # fast_sampler defaults on
        exact = FaceTracker(smooth=None, fast_sampler=False)
        sf = fast.init_state(batch=batch)
        se = exact.init_state(batch=batch)
        for _ in range(3):
            sf, of = fast.run_frames_gated(sf, frames)
            se, oe = exact.run_frames_gated(se, frames)
        assert bool(np.asarray(of["valid"]).all())
        err = np.abs(
            np.asarray(of["landmarks"])[..., :2]
            - np.asarray(oe["landmarks"])[..., :2]
        ).max()
        assert err < 1.0, f"fast-sampler landmark deviation {err}px"

        # Loss on one stream flips the gate to the full branch and recovers.
        frames2 = frames.at[1].set(0)
        sf, of = fast.run_frames_gated(sf, frames2)
        valid = np.asarray(of["valid"])
        assert valid[0] and not valid[1]
        sf, of = fast.run_frames_gated(sf, frames)
        assert bool(np.asarray(of["valid"]).all())

        # Forced detection (production redetect cadence) keeps tracking.
        step = jax.jit(lambda p, s, f: fast.step_batch(p, s, f, True))
        sf, of = step(fast.params, sf, frames)
        assert bool(np.asarray(of["valid"]).all())

    def test_scan_video(self, tracker, frame):
        frames = jnp.stack([frame] * 5)
        state = tracker.init_state()
        final_state, outs = tracker.scan_video(state, frames)
        assert outs["landmarks"].shape == (5, 468, 3)
        assert bool(jnp.all(outs["valid"][1:]))
        # Smoothing across identical frames must converge, not diverge.
        d01 = float(jnp.abs(outs["landmarks"][1] - outs["landmarks"][0]).max())
        d34 = float(jnp.abs(outs["landmarks"][4] - outs["landmarks"][3]).max())
        assert d34 <= d01 + 1e-3

    def test_long_horizon_stability(self, tracker, frame):
        """Soak: 40 identical frames through one scan — tracking must never
        drop, ROI and landmarks must converge (no drift/oscillation)."""
        frames = jnp.stack([frame] * 40)
        state = tracker.init_state()
        _, outs = tracker.scan_video(state, frames)
        valid = np.asarray(outs["valid"])
        assert valid[1:].all()
        rois = np.asarray(outs["roi"])
        drift = np.abs(rois[30:, :2] - rois[30, :2]).max()
        assert drift < 2.0, f"ROI drifting in steady state: {drift}px"
        # The crop→landmarks→ROI feedback has a small bounded limit cycle
        # (~1px) on static input, like any nearest-neighbor-resampled
        # tracker; assert bounded, not frozen.
        lm = np.asarray(outs["landmarks"])
        wobble = np.abs(lm[32:] - lm[32]).max()
        assert wobble < 3.0, f"landmarks oscillating: {wobble}px"


class TestFaceMeshV2Cascade:
    def test_cascade_with_mesh_v2(self, frame):
        """FaceTracker must also work with FaceMeshV2 (478 landmarks,
        extra tongueOut output) — the reference example's configuration."""
        from zaru_tpu.face.landmark.mediapipe import FaceMeshV2

        t = FaceTracker(landmarker=FaceMeshV2())
        state = t.init_state()
        state, out = t.run_frame(state, frame)
        assert bool(out["valid"])
        assert out["landmarks"].shape == (478, 3)
        assert float(out["confidence"]) > 0.9


def test_image_set_pixel():
    """Image.set must not crash on the read-only device view (regression)."""
    from zaru_tpu.color import Color
    from zaru_tpu.image import Image

    img = Image.new(4, 4)
    img.set(1, 2, Color(9, 8, 7, 255))
    assert img.get(1, 2) == Color(9, 8, 7, 255)


def test_landmarks_mutable_after_extract(sad_linus_cropped):
    """Landmarks stay mutable after a network extract (regression:
    set_positions used to keep a read-only device view)."""
    from zaru_tpu.face.landmark.mediapipe import FaceMeshV1
    from zaru_tpu.landmark import Estimator, Landmark

    res = Estimator(FaceMeshV1()).estimate(sad_linus_cropped)
    res.landmarks_mut().set(0, Landmark([1.0, 2.0, 3.0]))
    res.landmarks_mut().positions()[1] = [4.0, 5.0, 6.0]
    np.testing.assert_allclose(res.landmarks_mut().positions()[0], [1, 2, 3])
