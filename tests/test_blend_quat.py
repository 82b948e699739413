"""Blend/blit and quaternion tests (reference blend.rs:150-179 GPU tests +
zaru-linalg quat semantics)."""

import math

import numpy as np
import pytest

from zaru_tpu import quat
from zaru_tpu.color import Color
from zaru_tpu.geometry import Rect, RotatedRect
from zaru_tpu.image import Image
from zaru_tpu.image.blend import blend

TAU = 2 * math.pi


class TestBlend:
    def test_full_copy(self):
        rng = np.random.default_rng(0)
        src = Image(rng.integers(0, 256, (8, 8, 4), np.uint8))
        dest = Image.new(8, 8)
        out = blend(dest, src)
        np.testing.assert_array_equal(out.to_numpy(), src.to_numpy())

    def test_blit_to_partial_target(self):
        """Mirrors the reference's partial-target blit test
        (blend.rs:150-179)."""
        src = Image.filled(4, 4, Color(10, 20, 30, 255))
        dest = Image.new(8, 8)
        region = Rect.from_top_left(2.0, 2.0, 4.0, 4.0)
        out = blend(dest.view(region), src).to_numpy()
        # Inside the region: source color; outside: untouched zeros.
        np.testing.assert_array_equal(out[3, 3], [10, 20, 30, 255])
        np.testing.assert_array_equal(out[0, 0], [0, 0, 0, 0])
        np.testing.assert_array_equal(out[7, 7], [0, 0, 0, 0])

    def test_upscale_bilinear(self):
        # 2x2 gradient upscaled to 8x8: values must interpolate smoothly.
        src = np.zeros((2, 2, 4), np.uint8)
        src[0, 0] = [0, 0, 0, 255]
        src[0, 1] = [200, 0, 0, 255]
        src[1, 0] = [0, 200, 0, 255]
        src[1, 1] = [200, 200, 0, 255]
        dest = Image.new(8, 8)
        out = blend(dest, Image(src)).to_numpy()
        r = out[4, :, 0].astype(int)
        assert (np.diff(r[1:7]) >= 0).all()
        assert r[1] < 100 < r[6]

    def test_rotated_dest_region(self):
        src = Image.filled(4, 4, Color(255, 255, 255, 255))
        dest = Image.new(16, 16)
        region = RotatedRect.new(Rect.from_center(8.0, 8.0, 8.0, 2.0), TAU / 4)
        out = blend(dest.view(region), src).to_numpy()
        # The written region is now vertical: the column through the center
        # has white pixels, the row through the far edge does not.
        assert out[8, 8, 0] > 0
        assert out[4, 8, 0] > 0  # vertical extent
        assert out[8, 2, 0] == 0  # horizontal extent is only 2 wide


class TestQuat:
    def test_rotate_vec_quarter_turn_z(self):
        q = quat.from_rotation_z(TAU / 4)
        v = quat.rotate_vec(q, np.array([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)

    def test_multiply_composition(self):
        qa = quat.from_rotation_x(0.3)
        qb = quat.from_rotation_y(0.7)
        v = np.array([0.2, -0.5, 0.9], np.float32)
        via_quat = quat.rotate_vec(quat.multiply(qa, qb), v)
        via_seq = quat.rotate_vec(qa, quat.rotate_vec(qb, v))
        np.testing.assert_allclose(via_quat, via_seq, atol=1e-6)

    def test_matrix_roundtrip(self):
        q = quat.normalize(np.array([0.9, 0.1, -0.3, 0.2], np.float32))
        m = quat.to_rotation_matrix(q)
        q2 = quat.from_rotation_matrix(m)
        # Quaternion double cover: q and -q are the same rotation.
        assert min(np.abs(q - q2).max(), np.abs(q + q2).max()) < 1e-5

    def test_matrix_matches_rotate_vec(self):
        q = quat.from_euler(0.2, -0.4, 1.1)
        m = quat.to_rotation_matrix(q)
        v = np.array([1.0, 2.0, 3.0], np.float32)
        np.testing.assert_allclose(m @ v, quat.rotate_vec(q, v), atol=1e-5)

    def test_euler_roundtrip(self):
        angles = (0.3, -0.5, 1.2)
        q = quat.from_euler(*angles)
        q2 = quat.from_euler(*quat.to_euler(q))
        assert min(np.abs(q - q2).max(), np.abs(q + q2).max()) < 1e-5

    def test_axis_angle(self):
        q = quat.from_axis_angle(np.array([0.0, 0.0, 2.0]), TAU / 4)
        np.testing.assert_allclose(q, quat.from_rotation_z(TAU / 4), atol=1e-6)


def test_blend_filters_in_linear_light():
    """Fractional sampling must interpolate in linear light like the
    reference's sRGB texture views (image.rs:50-53): the midpoint of sRGB
    0 and 255 is ~188, not 128."""
    src = np.zeros((1, 2, 4), np.uint8)
    src[0, 1] = [255, 255, 255, 255]
    # Upscale 2x1 -> 8x1: middle output pixels sample between the texels.
    dest = Image.new(8, 1)
    out = blend(dest, Image(src)).to_numpy()
    mid = out[0, 3:5, 0].astype(float).mean()
    assert 170 < mid < 200, mid  # linear-space midpoint ~188
