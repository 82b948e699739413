"""Ingest uploader + misc coverage (facemesh v2 extras, timers)."""

import numpy as np
import pytest

from zaru_tpu.pipeline.ingest import FrameUploader, measure_ingest_bandwidth


class TestIngest:
    def test_uploader_roundtrip(self):
        up = FrameUploader(batch=2, shape=(4, 6, 4))
        a = np.full((4, 6, 4), 7, np.uint8)
        b = np.full((4, 6, 4), 9, np.uint8)
        up.stage(0, a)
        up.stage(1, b)
        dev = up.flush()
        out = np.asarray(dev)
        np.testing.assert_array_equal(out[0], a)
        np.testing.assert_array_equal(out[1], b)
        # Double buffering: staging after flush must not corrupt the
        # in-flight batch.
        up.stage(0, b)
        dev2 = up.flush()
        np.testing.assert_array_equal(np.asarray(dev2)[0], b)

    def test_bandwidth_measure(self):
        stats = measure_ingest_bandwidth(batch=2, shape=(64, 64, 4), iters=4)
        assert stats["gbytes_per_s"] > 0
        assert stats["frames_per_s"] > 0


class TestFaceMeshV2Extras:
    def test_iris_and_tongue(self, sad_linus_cropped):
        from zaru_tpu.face.landmark.mediapipe import FaceMeshV2
        from zaru_tpu.landmark import Estimator

        res = Estimator(FaceMeshV2()).estimate(sad_linus_cropped)
        assert res.confidence() > 0.9
        # tongueOut blendshape: neutral portrait -> near zero.
        assert 0.0 <= res.tongue_out < 0.3
        li, ri = res.left_iris(), res.right_iris()
        assert li.shape == (5, 3) and ri.shape == (5, 3)
        # Iris centers sit between the eye corners, left of right.
        assert li[0, 0] < ri[0, 0]
        left_eye = res.left_eye()
        assert left_eye.grow_rel(0.5).contains_point(li[0, :2])
        # Iris center inside its eye contour's bounding box.
        contour = res.left_eye_contour()[:, :2]
        assert contour[:, 0].min() - 1 <= li[0, 0] <= contour[:, 0].max() + 1

    def test_multipie68_layout(self, sad_linus_cropped):
        """68-pt landmarks: jaw below eyes, eyes above mouth — layout
        sanity per the Multi-PIE scheme."""
        from zaru_tpu.face.landmark.multipie68 import FaceOnnx
        from zaru_tpu.landmark import Estimator

        res = Estimator(FaceOnnx()).estimate(sad_linus_cropped)
        pos = res.landmarks_mut().positions()
        jaw_bottom = pos[8]  # chin
        left_eye = pos[36:42].mean(axis=0)
        right_eye = pos[42:48].mean(axis=0)
        mouth = pos[48:68].mean(axis=0)
        assert left_eye[1] < mouth[1] < jaw_bottom[1]
        assert left_eye[0] < right_eye[0]


def test_timer_ema_and_reset():
    from zaru_tpu.timer import Timer

    t = Timer("x")
    with t.measure():
        pass
    assert t.average_ms() is not None
    s = str(t)
    assert s.startswith("x: ")
    # Display resets state like the reference.
    assert t.average_ms() is None
