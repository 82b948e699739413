"""Geometry tests mirroring reference rect.rs/resolution.rs inline tests
(reference: crates/zaru-image/src/rect.rs:451-718,
crates/zaru-image/src/resolution.rs:184-227)."""

import math

import numpy as np
import pytest

from zaru_tpu.approx import assert_approx_eq
from zaru_tpu.geometry import (
    Rect,
    RotatedRect,
    rect_grow_to_fit_aspect,
    rect_iou,
    rrect_bounding,
    rrect_transform_in,
    rrect_transform_out,
    signed_angle_to_x,
)
from zaru_tpu.resolution import AspectRatio, Resolution

TAU = 2.0 * math.pi


class TestRect:
    def test_from_top_left(self):
        r = Rect.from_top_left(10.0, 20.0, 30.0, 40.0)
        assert r.x() == 10.0 and r.y() == 20.0
        assert r.width() == 30.0 and r.height() == 40.0
        np.testing.assert_allclose(r.center(), [25.0, 40.0])

    def test_bounding(self):
        r = Rect.bounding([[0.0, 0.0], [2.0, 3.0], [-1.0, 1.0]])
        assert r.x() == -1.0 and r.y() == 0.0
        assert r.width() == 3.0 and r.height() == 3.0
        assert Rect.bounding([]) is None

    def test_grow_rel(self):
        r = Rect.from_top_left(0.0, 0.0, 10.0, 20.0).grow_rel(0.1)
        assert r.width() == pytest.approx(12.0)
        assert r.height() == pytest.approx(24.0)
        np.testing.assert_allclose(r.center(), [5.0, 10.0])

    def test_grow_to_fit_aspect_wider(self):
        # 10x10 rect to 2:1 aspect -> width grows to 20.
        r = Rect.from_center(0.0, 0.0, 10.0, 10.0).grow_to_fit_aspect(
            AspectRatio.new(2, 1)
        )
        assert r.width() == 20.0 and r.height() == 10.0
        np.testing.assert_allclose(r.center(), [0.0, 0.0])

    def test_grow_to_fit_aspect_taller(self):
        r = Rect.from_center(0.0, 0.0, 10.0, 10.0).grow_to_fit_aspect(
            AspectRatio.new(1, 2)
        )
        assert r.width() == 10.0 and r.height() == 20.0

    def test_iou_disjoint(self):
        a = Rect.from_center(0.0, 0.0, 1.0, 1.0)
        b = Rect.from_center(5.0, 0.0, 1.0, 1.0)
        assert a.iou(b) == 0.0

    def test_iou_identical(self):
        a = Rect.from_center(1.0, 1.0, 2.0, 2.0)
        assert a.iou(a) == pytest.approx(1.0)

    def test_iou_half(self):
        a = Rect.from_top_left(0.0, 0.0, 2.0, 1.0)
        b = Rect.from_top_left(1.0, 0.0, 2.0, 1.0)
        # intersection 1, union 3
        assert a.iou(b) == pytest.approx(1.0 / 3.0)

    def test_iou_batched(self):
        a = np.array([[0.5, 0.5, 1.0, 1.0], [0.5, 0.5, 1.0, 1.0]], np.float32)
        b = np.array([[0.5, 0.5, 1.0, 1.0], [5.5, 0.5, 1.0, 1.0]], np.float32)
        np.testing.assert_allclose(rect_iou(a, b), [1.0, 0.0])

    def test_intersection(self):
        a = Rect.from_top_left(0.0, 0.0, 2.0, 2.0)
        b = Rect.from_top_left(1.0, 1.0, 2.0, 2.0)
        inter = a.intersection(b)
        assert inter.x() == 1.0 and inter.y() == 1.0
        assert inter.width() == 1.0 and inter.height() == 1.0
        assert a.intersection(Rect.from_top_left(5.0, 5.0, 1.0, 1.0)) is None

    def test_contains_point(self):
        r = Rect.from_top_left(0.0, 0.0, 2.0, 2.0)
        assert r.contains_point([1.0, 1.0])
        assert r.contains_point([0.0, 0.0])
        assert not r.contains_point([2.1, 0.0])

    def test_grow_move_center(self):
        r = Rect.from_top_left(0.0, 0.0, 1.0, 1.0).grow_move_center(0.0, 0.0)
        # Must still contain the original rect.
        assert r.contains_point([1.0, 1.0])
        np.testing.assert_allclose(r.center(), [0.0, 0.0])
        assert r.width() == 2.0 and r.height() == 2.0


class TestRotatedRect:
    def test_transform_identity(self):
        rr = RotatedRect.new(Rect.from_top_left(10.0, 10.0, 4.0, 4.0), 0.0)
        np.testing.assert_allclose(rr.transform_in([12.0, 12.0]), [2.0, 2.0])
        np.testing.assert_allclose(rr.transform_out([2.0, 2.0]), [12.0, 12.0])

    def test_transform_roundtrip_rotated(self):
        rr = RotatedRect.new(Rect.from_center(5.0, 7.0, 4.0, 2.0), 0.7)
        for pt in ([5.0, 7.0], [3.0, 6.0], [9.0, 9.0]):
            out = rr.transform_out(rr.transform_in(pt))
            assert_approx_eq(out, np.array(pt, np.float32), abs=1e-4)

    def test_transform_in_quarter_turn(self):
        # Rect centered at origin, rotated 90deg clockwise.
        rr = RotatedRect.new(Rect.from_center(0.0, 0.0, 2.0, 2.0), TAU / 4.0)
        # transform_in of the center is the local center.
        assert_approx_eq(rr.transform_in([0.0, 0.0]), np.array([1.0, 1.0]), abs=1e-6)

    def test_bounding_unrotated(self):
        rr = RotatedRect.bounding(0.0, [[0.0, 0.0], [4.0, 2.0]])
        assert rr.rect().width() == pytest.approx(4.0)
        assert rr.rect().height() == pytest.approx(2.0)
        np.testing.assert_allclose(rr.center(), [2.0, 1.0])

    def test_bounding_rotated_90(self):
        # Points on the X axis; bounding box at 90deg has them along its
        # (rotated) width.
        rr = RotatedRect.bounding(TAU / 4.0, [[0.0, 0.0], [4.0, 0.0]])
        assert rr.rect().height() == pytest.approx(4.0, abs=1e-5)
        assert_approx_eq(rr.center(), np.array([2.0, 0.0]), abs=1e-5)

    def test_bounding_contains_points(self):
        rng = np.random.default_rng(7)
        pts = rng.uniform(-5, 5, size=(20, 2)).astype(np.float32)
        for angle in (0.0, 0.3, -1.2, 2.9):
            rr = RotatedRect.bounding(angle, pts)
            grown = rr.grow_rel(1e-3)
            for p in pts:
                assert grown.contains_point(p), (angle, p)

    def test_rotated_corners(self):
        rr = RotatedRect.new(Rect.from_center(0.0, 0.0, 2.0, 2.0), TAU / 8.0)
        corners = rr.rotated_corners()
        d = np.hypot(corners[:, 0], corners[:, 1])
        np.testing.assert_allclose(d, np.sqrt(2.0), rtol=1e-5)

    def test_contains_point(self):
        rr = RotatedRect.new(Rect.from_center(0.0, 0.0, 4.0, 0.5), TAU / 4.0)
        assert rr.contains_point([0.0, 1.9])
        assert not rr.contains_point([1.0, 0.0])


class TestSignedAngle:
    def test_y_to_x_quarter_turn(self):
        # Mirrors zaru-linalg vector.rs:556-566 doc tests.
        assert signed_angle_to_x(np.array([0.0, 1.0])) == pytest.approx(TAU / 4)
        assert signed_angle_to_x(np.array([1.0, 0.0])) == pytest.approx(0.0)


class TestResolution:
    def test_aspect_ratio_reduced(self):
        assert Resolution.new(1920, 1080).aspect_ratio() == AspectRatio.new(16, 9)
        assert str(AspectRatio.new(1920, 1080)) == "16:9"

    def test_fit_aspect_letterbox(self):
        # 16:9 target inside a square input -> letterbox top/bottom.
        r = Resolution.new(100, 100).fit_aspect_ratio(AspectRatio.new(16, 9))
        assert r.width() == pytest.approx(100.0)
        assert r.height() == pytest.approx(100.0 * 9 / 16)
        assert r.x() == 0.0
        assert r.y() == pytest.approx((100.0 - 100.0 * 9 / 16) / 2)

    def test_fit_aspect_pillarbox(self):
        r = Resolution.new(100, 100).fit_aspect_ratio(AspectRatio.new(9, 16))
        assert r.height() == pytest.approx(100.0)
        assert r.width() == pytest.approx(100.0 * 9 / 16)

    def test_grow_to_fit_aspect_functional_f32(self):
        rect = np.array([0.0, 0.0, 10.0, 10.0], np.float32)
        out = rect_grow_to_fit_aspect(rect, np.float32(2.0))
        np.testing.assert_allclose(out, [0.0, 0.0, 20.0, 10.0])
