"""Hand & body module tests.

No hand/body fixture photos exist (the reference has no hand/body golden
tests either), so these validate: anchor layouts, extraction math on
synthetic outputs, real-model plumbing on noise (shape/empty-result checks),
missing-blob gating, and the HandTracker scheduling logic with mock
networks.
"""

import math

import numpy as np
import pytest

from zaru_tpu.assets import ModelMissingError
from zaru_tpu.detection import Detections, Detector
from zaru_tpu.geometry import Rect
from zaru_tpu.hand import detection as palm
from zaru_tpu.hand import landmark as hand_lm
from zaru_tpu.hand.tracking import HandData, HandId, HandTracker
from zaru_tpu.image import Image


class TestPalmDetection:
    def test_anchor_count(self):
        net = palm.LiteNetwork()
        assert net.anchors.anchor_count() == 2 * 24 * 24 + 6 * 12 * 12  # 2016

    def test_extract_synthetic(self):
        """Synthetic raw outputs decode to the expected box/keypoints/angle."""
        net = palm.LiteNetwork()
        n = net.anchors.anchor_count()
        boxes = np.zeros((1, n, 18), np.float32)
        confs = np.full((1, n, 1), -20.0, np.float32)
        idx = 700
        confs[0, idx, 0] = 20.0  # sigmoid ~ 1
        anchor = net.anchors.centers[idx] * 192.0
        boxes[0, idx, 0:4] = [4.0, -2.0, 60.0, 50.0]
        # Wrist below middle-MCP -> fingers up -> angle 0.
        boxes[0, idx, 4 + 2 * palm.Keypoint.WRIST : 6 + 2 * palm.Keypoint.WRIST] = [0.0, 30.0]
        boxes[0, idx, 4 + 2 * palm.Keypoint.MIDDLE_FINGER_MCP : 6 + 2 * palm.Keypoint.MIDDLE_FINGER_MCP] = [0.0, -10.0]

        dets = Detections()
        net.extract([boxes, confs], 0.5, dets)
        assert len(dets) == 1
        det = next(dets.iter())
        np.testing.assert_allclose(
            det.bounding_rect().center(), anchor + [4.0, -2.0], rtol=1e-5
        )
        assert det.bounding_rect().width() == pytest.approx(60.0)
        assert det.angle() == pytest.approx(0.0)
        # Rotate: wrist to the right of MCP -> hand pointing left ->
        # clockwise angle -90deg (fingers left need +90 cw to point up).
        boxes[0, idx, 4:6] = [30.0, 0.0]
        boxes[0, idx, 4 + 2 * palm.Keypoint.MIDDLE_FINGER_MCP : 6 + 2 * palm.Keypoint.MIDDLE_FINGER_MCP] = [-10.0, 0.0]
        dets2 = Detections()
        net.extract([boxes, confs], 0.5, dets2)
        assert math.degrees(next(dets2.iter()).angle()) == pytest.approx(-90.0)

    def test_no_detections_on_noise(self):
        rng = np.random.default_rng(0)
        img = Image.from_array(rng.integers(0, 255, (192, 192, 3), np.uint8))
        det = Detector(palm.LiteNetwork())
        det.set_threshold(0.7)
        result = det.detect(img)
        # Noise shouldn't produce confident palms (weak check: just no crash
        # and plausible count).
        assert len(result) < 5

    def test_full_network_gated(self):
        with pytest.raises(ModelMissingError, match="palm_detection_full"):
            palm.FullNetwork().cnn()


class TestHandLandmark:
    def test_real_model_shapes(self):
        from zaru_tpu.landmark import Estimator

        rng = np.random.default_rng(1)
        img = Image.from_array(rng.integers(0, 255, (224, 224, 3), np.uint8))
        est = Estimator(hand_lm.LiteNetwork())
        res = est.estimate(img)
        assert res.landmarks.positions().shape == (21, 3)
        assert 0.0 <= res.presence <= 1.0
        assert res.handedness() in (hand_lm.Handedness.LEFT, hand_lm.Handedness.RIGHT)

    def test_rotation_radians(self):
        res = hand_lm.LandmarkResult()
        pos = res.landmarks.positions()
        pos[hand_lm.LandmarkIdx.WRIST] = [50.0, 100.0, 0.0]
        pos[hand_lm.LandmarkIdx.MIDDLE_FINGER_MCP] = [50.0, 40.0, 0.0]
        assert res.rotation_radians() == pytest.approx(0.0)  # fingers up
        pos[hand_lm.LandmarkIdx.MIDDLE_FINGER_MCP] = [110.0, 100.0, 0.0]
        # Fingers pointing right -> rotate 90deg clockwise to upright...
        assert math.degrees(res.rotation_radians()) == pytest.approx(90.0)

    def test_palm_center(self):
        res = hand_lm.LandmarkResult()
        res.landmarks.positions()[:] = 0
        res.landmarks.positions()[[int(i) for i in hand_lm.PALM_LANDMARKS]] = [
            [6.0, 12.0, 0.0]
        ] * 6
        np.testing.assert_allclose(res.palm_center(), [6.0, 12.0, 0.0])

    def test_connectivity_indices_valid(self):
        for a, b in hand_lm.CONNECTIVITY:
            assert 0 <= int(a) < 21 and 0 <= int(b) < 21

    def test_full_network_gated(self):
        with pytest.raises(ModelMissingError, match="hand_landmark_full"):
            hand_lm.FullNetwork().cnn()


class TestBodyGating:
    def test_pose_detection_anchors(self):
        from zaru_tpu.body.detection import PoseNetwork

        net = PoseNetwork()
        assert net.anchors.anchor_count() == 2 * 28 * 28 + 2 * 14 * 14 + 6 * 7 * 7

    def test_pose_models_gated(self):
        from zaru_tpu.body import detection as bd
        from zaru_tpu.body import landmark as bl

        with pytest.raises(ModelMissingError):
            bd.PoseNetwork().cnn()
        with pytest.raises(ModelMissingError):
            bl.LiteNetwork().cnn()

    def test_body_landmark_extract_synthetic(self):
        from zaru_tpu.body import landmark as bl

        est = bl.LandmarkResult()
        screen = np.zeros((1, 39 * 5), np.float32)
        screen[0, 0::5] = 10.0  # x
        screen[0, 3::5] = 2.0  # visibility logits
        screen[0, 4::5] = -2.0  # presence logits
        flag = np.array([[0.9]], np.float32)
        bl.LiteNetwork().extract([screen, flag], est)
        assert est.presence() == pytest.approx(0.9)
        np.testing.assert_allclose(est.landmarks.positions()[:, 0], 10.0)
        assert est.landmarks.visibility[0] == pytest.approx(1 / (1 + math.exp(-2)))
        assert est.landmarks.presence[0] == pytest.approx(1 / (1 + math.exp(2)))


# ---------------------------------------------------------------------------
# HandTracker scheduling with mock networks
# ---------------------------------------------------------------------------


class _FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


class _MockHandTrackerHarness:
    """Drives HandTracker with monkeypatched Detector/LandmarkTracker."""


def _mk_detection(cx, cy, size=40.0, conf=0.9, angle=0.0):
    from zaru_tpu.detection import Detection

    return Detection(conf, Rect.from_center(cx, cy, size, size), angle=angle)


@pytest.fixture
def mock_tracker(monkeypatch):
    """HandTracker with stubbed detector + landmark trackers."""
    import zaru_tpu.hand.tracking as tr

    detections_script = {"dets": []}

    class FakeDetector:
        def __init__(self, net):
            pass

        def detect(self, image):
            return list(detections_script["dets"])

    class FakeEstimator:
        def __init__(self, net):
            pass

    class FakeLandmarkTracker:
        def __init__(self, estimator):
            self._roi = None
            self.lost = False

        def set_roi_padding(self, p):
            pass

        def set_roi(self, roi):
            self._roi = roi

        def roi(self):
            return None if self.lost else self._roi

        def track(self, image):
            if self.lost or self._roi is None:
                return None
            from zaru_tpu.landmark import TrackingResult

            lm = hand_lm.LandmarkResult()
            lm.presence = 0.95
            center = self._roi.center()
            lm.landmarks.positions()[:] = [center[0], center[1], 0.0]
            return TrackingResult(self._roi, lm, self._roi)

    monkeypatch.setattr(tr, "Detector", FakeDetector)
    monkeypatch.setattr(tr, "Estimator", FakeEstimator)
    monkeypatch.setattr(tr, "LandmarkTracker", FakeLandmarkTracker)

    clock = _FakeClock()
    tracker = tr.HandTracker(clock=clock)
    return tracker, detections_script, clock


class TestHandTrackerScheduling:
    def test_spawns_tracker_per_detection(self, mock_tracker):
        tracker, script, clock = mock_tracker
        script["dets"] = [_mk_detection(50, 50), _mk_detection(200, 200)]
        tracker.track(None)
        hands = tracker.hands()
        assert len(hands) == 2
        ids = {h.id for h in hands}
        assert len(ids) == 2

    def test_dedup_overlapping_detection(self, mock_tracker):
        tracker, script, clock = mock_tracker
        script["dets"] = [_mk_detection(50, 50)]
        tracker.track(None)
        assert len(tracker.hands()) == 1
        # Same detection again within the redetect window: no new tracker,
        # ID stays stable.
        first_id = tracker.hands()[0].id
        clock.t += 1.0  # force redetect
        tracker.track(None)
        assert len(tracker.hands()) == 1
        assert tracker.hands()[0].id == first_id

    def test_redetect_interval(self, mock_tracker):
        tracker, script, clock = mock_tracker
        script["dets"] = [_mk_detection(50, 50)]
        tracker.track(None)
        assert len(tracker.hands()) == 1
        # New far-away hand appears but interval hasn't elapsed -> not
        # picked up while a hand is tracked.
        script["dets"] = [_mk_detection(50, 50), _mk_detection(400, 400)]
        clock.t += 0.1
        tracker.track(None)
        assert len(tracker.hands()) == 1
        # After the interval it is.
        clock.t += 0.5
        tracker.track(None)
        assert len(tracker.hands()) == 2

    def test_lost_hand_removed(self, mock_tracker):
        tracker, script, clock = mock_tracker
        script["dets"] = [_mk_detection(50, 50)]
        tracker.track(None)
        (hand,) = tracker._hands
        script["dets"] = []
        hand.tracker.lost = True
        clock.t += 1.0
        tracker.track(None)
        assert len(tracker.hands()) == 0

    def test_overlapping_trackers_culled(self, mock_tracker):
        tracker, script, clock = mock_tracker
        # Two detections that don't overlap as palms but whose grown hand
        # rects drift together can't be scripted via the fake tracker (ROIs
        # are static), so seed two overlapping ROIs directly.
        script["dets"] = [_mk_detection(100, 100, size=60)]
        tracker.track(None)
        script["dets"] = [_mk_detection(460, 100, size=60)]
        clock.t += 1.0
        tracker.track(None)
        assert len(tracker.hands()) == 2
        # Move tracker 2's ROI onto tracker 1's.
        tracker._hands[1].tracker._roi = tracker._hands[0].tracker._roi
        script["dets"] = []
        clock.t += 1.0
        tracker.track(None)
        assert len(tracker.hands()) == 1
