"""Golden-image face tests — the reference's primary correctness gate
(reference: face/detection.rs:159-174, mediapipe.rs:554-625), re-run through
the TPU-native stack on the same fixture photos with the same semantic
invariants."""

import math

import numpy as np
import pytest

from zaru_tpu.detection import Detector
from zaru_tpu.face.detection import FullRangeNetwork, Keypoint, ShortRangeNetwork
from zaru_tpu.face.landmark.mediapipe import FaceMeshV1, FaceMeshV2
from zaru_tpu.geometry import Rect, RotatedRect
from zaru_tpu.landmark import Estimator, LandmarkTracker

TAU = 2 * math.pi


@pytest.fixture(scope="module")
def detector():
    return Detector(ShortRangeNetwork())


class TestFaceDetection:
    def test_detects_face(self, detector, sad_linus_full):
        """(face/detection.rs:163-174)"""
        detections = list(detector.detect(sad_linus_full))
        assert detections, "no detection"
        det = detections[0]
        assert det.confidence() >= 0.8, det.confidence()
        angle_deg = math.degrees(det.angle())
        assert abs(angle_deg) < 5.0, angle_deg

    def test_detection_rect_contains_eyes(self, detector, sad_linus_full):
        det = list(detector.detect(sad_linus_full))[0]
        rect = det.bounding_rect().grow_rel(0.2)
        for idx in (Keypoint.LEFT_EYE, Keypoint.RIGHT_EYE):
            assert rect.contains_point(det.keypoint(idx)), idx

    def test_eyes_ordered_left_right(self, detector, sad_linus_full):
        det = list(detector.detect(sad_linus_full))[0]
        left = det.keypoint(Keypoint.LEFT_EYE)
        right = det.keypoint(Keypoint.RIGHT_EYE)
        assert left[0] < right[0]

    def test_full_range_detects_face(self, sad_linus_full):
        det = Detector(FullRangeNetwork())
        detections = list(det.detect(sad_linus_full))
        assert detections and detections[0].confidence() >= 0.8


class TestFaceMesh:
    @pytest.mark.parametrize("network_cls", [FaceMeshV1, FaceMeshV2])
    def test_mesh_confidence_on_crop(self, network_cls, sad_linus_cropped):
        """(mediapipe.rs:554-580): cropped face → high face flag, landmarks
        inside the crop, roughly upright rotation."""
        est = Estimator(network_cls())
        res = est.estimate(sad_linus_cropped)
        assert res.confidence() > 0.9, res.confidence()
        rot_deg = math.degrees(res.rotation_radians())
        assert abs(rot_deg) < 10.0, rot_deg

        pos = res.landmarks_mut().positions()
        w, h = sad_linus_cropped.width(), sad_linus_cropped.height()
        # Landmarks may hang slightly outside the crop; allow 20% slack.
        assert (pos[:, 0] > -0.2 * w).all() and (pos[:, 0] < 1.2 * w).all()
        assert (pos[:, 1] > -0.2 * h).all() and (pos[:, 1] < 1.2 * h).all()

    def test_rotation_tracks_rotated_views(self, sad_linus_cropped):
        """(mediapipe.rs:581-608): synthetic ±10° rotated views must produce
        eye-derived rotations within 5° of the applied rotation."""
        est = Estimator(FaceMeshV1())
        img = sad_linus_cropped
        base = RotatedRect.from_rect(img.rect())
        for deg in (-10.0, 0.0, 10.0):
            rad = math.radians(deg)
            view = img.view(RotatedRect.new(base.rect(), rad))
            res = est.estimate(view)
            assert res.confidence() > 0.8
            got_deg = math.degrees(res.rotation_radians())
            # Rotating the view clockwise by X makes the face appear rotated
            # by -X in view coords.
            assert abs(got_deg + deg) < 5.0, (deg, got_deg)

    def test_eye_rects_sane(self, sad_linus_cropped):
        est = Estimator(FaceMeshV2())
        res = est.estimate(sad_linus_cropped)
        left = res.left_eye()
        right = res.right_eye()
        assert left.center()[0] < right.center()[0]
        for eye in (left, right):
            assert 0 < eye.rect().width() < sad_linus_cropped.width() / 2


class TestTracker:
    def test_detect_then_track(self, detector, sad_linus_full):
        """The facemesh example's drive loop (examples/facemesh.rs:33-60):
        seed the tracker from a detection, track across (identical) frames,
        ROI stays on the face and confidence stays high."""
        detections = list(detector.detect(sad_linus_full))
        best = max(detections, key=lambda d: d.confidence())

        tracker = LandmarkTracker(Estimator(FaceMeshV1()))
        tracker.set_roi(best.bounding_rect())

        last_roi = None
        for _ in range(3):
            result = tracker.track(sad_linus_full)
            assert result is not None, "tracking lost"
            assert result.estimate().confidence() > 0.9
            last_roi = result.updated_roi()

        # ROI must still cover the original detection center.
        assert last_roi.grow_rel(0.2).contains_point(best.bounding_rect().center())

    def test_tracking_loss_on_blank_image(self):
        from zaru_tpu.image import Image

        tracker = LandmarkTracker(Estimator(FaceMeshV1()))
        tracker.set_roi(Rect.from_center(64.0, 64.0, 64.0, 64.0))
        blank = Image.new(128, 128)
        assert tracker.track(blank) is None
        assert tracker.roi() is None
        # Subsequent calls return None without re-seeding (landmark.rs:447).
        assert tracker.track(blank) is None
