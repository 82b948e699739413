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


class TestFusedIris:
    def test_iris_stage(self, frame, sad_linus_full):
        """FaceTracker(iris=True): fused mesh→eye-crop→iris refinement
        (BASELINE config 4). Iris centers must land inside the host-path
        eye views and near the host pipeline's centers."""
        from zaru_tpu.face.eye import EyeNetwork
        from zaru_tpu.face.landmark.mediapipe import FaceMeshV1
        from zaru_tpu.image import Image
        from zaru_tpu.landmark import Estimator
        from zaru_tpu.resolution import Resolution

        t = FaceTracker(smooth=None, iris=True)
        state = t.init_state()
        for _ in range(2):
            state, out = t.run_frame(state, frame)
        assert bool(out["valid"])
        eyes = np.asarray(out["eyes"])
        assert eyes.shape == (2, 76, 3)

        # Host pipeline reference (examples/eye_tracking.py semantics:
        # detection-seeded tracked mesh -> eye crops -> iris).
        from zaru_tpu.detection import Detector
        from zaru_tpu.face.detection import ShortRangeNetwork
        from zaru_tpu.landmark import LandmarkTracker

        det = max(
            Detector(ShortRangeNetwork()).detect(sad_linus_full),
            key=lambda d: d.confidence(),
        )
        host_tracker = LandmarkTracker(Estimator(FaceMeshV1()))
        host_tracker.set_roi(det.bounding_rect())
        for _ in range(2):
            mesh = host_tracker.track(sad_linus_full).estimate()
        eye_est = Estimator(EyeNetwork())
        host_centers = []
        for rect, flip in ((mesh.left_eye(), False), (mesh.right_eye(), True)):
            # Square-aspect grow BEFORE materializing: the crop carries
            # real pixels like the reference's composing views (and like
            # the fused sampler), not black aspect-padding bands.
            grown = rect.grow_rel(0.8).grow_to_fit_aspect(1.0)
            crop = sad_linus_full.view(grown).to_image()
            if flip:
                arr = np.ascontiguousarray(crop.to_numpy()[:, ::-1])
                lms = eye_est.estimate(Image(arr))
                lms.flip_horizontal_in_place(
                    Resolution(arr.shape[1], arr.shape[0])
                )
            else:
                lms = eye_est.estimate(crop)
            host_centers.append(grown.transform_out(lms.iris_center()[:2]))
        host_centers = np.stack(host_centers)

        fused_centers = eyes[:, 0, :2]
        err = np.abs(fused_centers - host_centers).max()
        # Different (shorter) resampling chain than the host's
        # crop-materialize path; centers agree within a few px.
        assert err < 4.0, f"iris center deviation {err}px: {fused_centers} vs {host_centers}"

    def test_iris_batched_gated(self, frame):
        t = FaceTracker(smooth=None, iris=True)
        frames = jnp.stack([frame] * 2)
        state = t.init_state(batch=2)
        for _ in range(2):
            state, out = t.run_frames_gated(state, frames)
        assert out["eyes"].shape == (2, 2, 76, 3)
        assert bool(np.asarray(out["valid"]).all())
        # Both streams see the same frame: identical iris outputs.
        e = np.asarray(out["eyes"])
        np.testing.assert_allclose(e[0], e[1], atol=1e-5)
        # And consistent with the per-stream step path within a pixel.
        s1 = t.init_state()
        for _ in range(2):
            s1, o1 = t.run_frame(s1, frame)
        err = np.abs(np.asarray(o1["eyes"])[:, :, :2] - e[0][:, :, :2]).max()
        assert err < 1.5, f"fused batched-vs-single iris deviation {err}px"


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


class TestAnyRotationTracking:
    """Round-3: the serving path samples rotated views EXACTLY at any
    angle (rolled-window full-band sampler) — the round-2 ±0.5 rad view
    clamp is gone. Reference semantics: image/mod.rs:224-247."""

    @pytest.mark.parametrize("deg", [55.0, 80.0])
    def test_tilted_face_matches_exact_sampler(self, sad_linus_full, deg):
        """Drive both sampler paths on a strongly tilted photo: they must
        stay locked and produce IDENTICAL landmarks every frame (the old
        clamped path diverged from the exact sampler past ~29 deg)."""
        import cv2

        rgba = np.asarray(sad_linus_full.data)
        h, w = rgba.shape[:2]
        mat = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 0.9)
        rot = cv2.warpAffine(rgba, mat, (w, h))
        frame = jnp.asarray(rot)[None]

        fast = FaceTracker(smooth=None)
        exact = FaceTracker(smooth=None, fast_sampler=False)
        sf = fast.init_state(batch=1)
        se = exact.init_state(batch=1)
        for i in range(4):
            sf, of = fast.run_frames_gated(sf, frame)
            se, oe = exact.run_frames_gated(se, frame)
            assert bool(of["valid"][0]), f"fast path lost face at frame {i}"
            assert bool(oe["valid"][0]), f"exact path lost face at frame {i}"
            err = np.abs(
                np.asarray(of["landmarks"])[0, :, :2]
                - np.asarray(oe["landmarks"])[0, :, :2]
            ).max()
            assert err < 1.0, f"deviation {err}px at {deg} deg frame {i}"

    def test_large_view_angle_parity(self, sad_linus_full):
        """Track step with the view rect pinned at 60 deg rotation — well
        past the deleted clamp — must match the exact sampler to <1px.
        Exercises the rolled-window sampler inside the cascade directly."""
        frame = jnp.asarray(sad_linus_full.data)[None]
        fast = FaceTracker(smooth=None)
        exact = FaceTracker(smooth=None, fast_sampler=False)

        # Seed a tracking state, then force a strongly rotated ROI.
        state = fast.init_state(batch=1)
        state, _ = fast.run_frames_gated(state, frame)
        base = np.array(state["roi"])

        for size_scale, tol in [
            # Scaled so the 60-deg bbox stays <= 2*PRESCALE_M: stride-2
            # sampling, <=1 source px index error -> ~1px landmarks.
            (0.7, 1.5),
            # Full tracked size: bbox ~1144 at 60 deg -> stride 3 on the
            # take-fallback path, index error <= 2 source px (documented
            # integer-stride subsampling; ops/rotated_fast.py).
            (1.0, 8.0),
        ]:
            roi = base.copy()
            roi[:, 2:4] *= size_scale
            roi[:, 4] = np.radians(60.0)
            st = dict(state, roi=jnp.asarray(roi),
                      tracking=jnp.ones(1, bool))
            no_seed = jnp.zeros(1, bool)
            _, of = jax.jit(fast._track_batch)(
                fast.params, st, frame, st["roi"], no_seed
            )
            _, oe = jax.jit(exact._track_batch)(
                exact.params, st, frame, st["roi"], no_seed
            )
            err = np.abs(
                np.asarray(of["landmarks"])[0, :, :2]
                - np.asarray(oe["landmarks"])[0, :, :2]
            ).max()
            assert err < tol, f"60-deg view deviation {err}px @ {size_scale}"
