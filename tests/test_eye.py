"""Iris/eye landmark tests on the fixture photo (BASELINE config 4):
face mesh → eye crops → EyeNetwork; iris must land inside the eye region
with a plausible diameter; right eye via horizontal flip
(reference eye.rs:82,121-134)."""

import numpy as np
import pytest

from zaru_tpu.face.eye import EyeNetwork
from zaru_tpu.face.landmark.mediapipe import FaceMeshV1
from zaru_tpu.image import Image
from zaru_tpu.landmark import Estimator
from zaru_tpu.resolution import Resolution


@pytest.fixture(scope="module")
def mesh_result(sad_linus_cropped):
    est = Estimator(FaceMeshV1())
    res = est.estimate(sad_linus_cropped)
    assert res.confidence() > 0.9
    return res


def _estimate_eye(image, eye_rect, flip=False):
    est = Estimator(EyeNetwork())
    grown = eye_rect.grow_rel(0.8)
    view = image.view(grown)
    if flip:
        crop = view.to_image().to_numpy()[:, ::-1]
        landmarks = est.estimate(Image(np.ascontiguousarray(crop)))
        landmarks.flip_horizontal_in_place(
            Resolution(crop.shape[1], crop.shape[0])
        )
    else:
        landmarks = est.estimate(view.to_image())
    return landmarks, grown


class TestEyeLandmarks:
    def test_left_iris_inside_eye(self, mesh_result, sad_linus_cropped):
        eye_rect = mesh_result.left_eye()
        lms, grown = _estimate_eye(sad_linus_cropped, eye_rect)
        center = lms.iris_center()
        # Iris center must be inside the (generously grown) eye crop, in
        # crop coordinates.
        w = grown.rect().width()
        h = grown.rect().height()
        assert 0.2 * w < center[0] < 0.8 * w, center
        assert 0.2 * h < center[1] < 0.8 * h, center

    def test_right_iris_via_flip(self, mesh_result, sad_linus_cropped):
        eye_rect = mesh_result.right_eye()
        lms, grown = _estimate_eye(sad_linus_cropped, eye_rect, flip=True)
        center = lms.iris_center()
        w = grown.rect().width()
        h = grown.rect().height()
        assert 0.2 * w < center[0] < 0.8 * w, center
        assert 0.2 * h < center[1] < 0.8 * h, center

    def test_iris_diameter_plausible(self, mesh_result, sad_linus_cropped):
        lms, grown = _estimate_eye(sad_linus_cropped, mesh_result.left_eye())
        d = lms.iris_diameter()
        # Iris should span a sane fraction of the eye crop.
        assert 0.05 * grown.rect().width() < d < 0.8 * grown.rect().width(), d

    def test_eye_contour_surrounds_iris(self, mesh_result, sad_linus_cropped):
        lms, _ = _estimate_eye(sad_linus_cropped, mesh_result.left_eye())
        contour = lms.eye_contour()[:16, :2]
        center = lms.iris_center()[:2]
        mn, mx = contour.min(axis=0), contour.max(axis=0)
        assert (mn[0] - 2 <= center[0] <= mx[0] + 2), (mn, center, mx)

    def test_subpixel_stability(self, mesh_result, sad_linus_cropped):
        """Sub-pixel fidelity: shifting the crop by one pixel must shift the
        iris center by about one pixel (not snap)."""
        eye_rect = mesh_result.left_eye()
        lms_a, grown = _estimate_eye(sad_linus_cropped, eye_rect)
        shifted = eye_rect.map(lambda r: r.move_by([1.0, 0.0]))
        lms_b, _ = _estimate_eye(sad_linus_cropped, shifted)
        delta = lms_a.iris_center()[:2] - (lms_b.iris_center()[:2] + [1.0, 0.0])
        # Crop shifted +1px -> content appears 1px left -> centers should
        # roughly cancel; allow 1.5px network noise.
        assert np.abs(delta).max() < 1.5, delta
