"""Sampling-kernel parity tests.

A literal scalar re-implementation of the reference's sampling chain
(`Cnn::image_map` nn/mod.rs:54-80 → `ViewData::get` image/mod.rs:224-247)
serves as the oracle; the vectorized device gather must match it *bitwise*
on every pixel, including rotated views, view composition, and OOB handling.
Mirrors the reference's 2x2/3x3 rotated-view pixel tests
(crates/zaru/src/image/tests.rs:1-139)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from zaru_tpu.color import Color
from zaru_tpu.geometry import Rect, RotatedRect
from zaru_tpu.image import Image, ImageView
from zaru_tpu.ops.sampling import sample_view_rgba, view_to_tensor

TAU = 2 * math.pi


# --- scalar oracle (literal port of the reference semantics) ---------------


def oracle_view_get(img: np.ndarray, rrect: np.ndarray, x: int, y: int):
    """ViewData::get (image/mod.rs:224-247), scalar."""
    cx, cy, w, h, rad = (float(v) for v in rrect)
    # transform_out([x+0.5, y+0.5])
    px, py = x + 0.5 - w * 0.5, y + 0.5 - h * 0.5
    c, s = math.cos(rad), math.sin(rad)
    ox = c * px - s * py + w * 0.5 + (cx - w * 0.5)
    oy = s * px + c * py + h * 0.5 + (cy - h * 0.5)

    def round_half_away(v):
        return math.floor(abs(v) + 0.5) * (1 if v >= 0 else -1)

    xi = round_half_away(ox - 0.5)
    yi = round_half_away(oy - 0.5)
    if xi < 0 or yi < 0 or xi >= img.shape[1] or yi >= img.shape[0]:
        return np.zeros(4, np.uint8)
    return img[yi, xi]


def oracle_cnn_sample(img, rrect, out_w, out_h):
    """Cnn::image_map sampling (nn/mod.rs:54-73), scalar loops."""
    cx, cy, w, h, rad = (float(v) for v in rrect)
    out = np.zeros((out_h, out_w, 4), np.uint8)
    for yo in range(out_h):
        for xo in range(out_w):
            u, v = xo / out_w, yo / out_h
            xv = math.floor(abs(u * w) + 0.5)  # round, always >= 0
            yv = math.floor(abs(v * h) + 0.5)
            out[yo, xo] = oracle_view_get(img, rrect, xv, yv)
    return out


def random_image(rng, w, h):
    return rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)


class TestSamplingParity:
    @pytest.mark.parametrize("angle", [0.0, 0.3, -0.7, TAU / 4, 2.5])
    def test_rotated_view_matches_oracle(self, angle):
        rng = np.random.default_rng(42)
        img = random_image(rng, 31, 23)
        rrect = np.array([14.0, 10.0, 12.0, 8.0, angle], np.float32)
        got = np.asarray(
            sample_view_rgba(jnp.asarray(img), jnp.asarray(rrect), 12, 8, scale_to_view=False)
        )
        want = np.stack(
            [
                np.stack([oracle_view_get(img, rrect, x, y) for x in range(12)])
                for y in range(8)
            ]
        )
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("angle", [0.0, 0.45, -1.1])
    def test_cnn_sampling_matches_oracle(self, angle):
        rng = np.random.default_rng(7)
        img = random_image(rng, 40, 30)
        rrect = np.array([20.0, 15.0, 33.0, 21.0, angle], np.float32)
        got = np.asarray(sample_view_rgba(jnp.asarray(img), jnp.asarray(rrect), 16, 16))
        want = oracle_cnn_sample(img, rrect, 16, 16)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize(
        "shape,rrect",
        [
            # In-bounds letterbox fits (angle 0) at scale < 1, == 1, > 4
            # (the stride regime where the MXU fast sampler quantizes;
            # this path must NOT), plus an OOB-hanging letterbox.
            ((30, 40), [20.0, 15.0, 40.0, 30.0, 0.0]),
            ((30, 40), [20.0, 15.0, 16.0, 16.0, 0.0]),
            ((270, 480), [240.0, 135.0, 480.0, 480.0, 0.0]),
            ((30, 40), [2.0, 3.0, 40.0, 40.0, 0.0]),
        ],
    )
    def test_letterbox_sampler_bit_exact(self, shape, rrect):
        """letterbox_sample_core (two 1-D takes) must equal the exact 2-D
        gather bit-for-bit on angle-0 views at ANY scale, including OOB."""
        from zaru_tpu.ops.sampling import letterbox_sample_core, view_to_tensor_core

        rng = np.random.default_rng(11)
        img = random_image(rng, shape[1], shape[0])
        rr = jnp.asarray(np.array(rrect, np.float32))
        out_w, out_h = 16, 16
        got = np.asarray(
            letterbox_sample_core(jnp.asarray(img), rr, out_w, out_h, -1.0, 1.0)
        )
        want = np.asarray(
            view_to_tensor_core(jnp.asarray(img), rr, out_w, out_h, -1.0, 1.0, "NHWC")
        )[0]
        np.testing.assert_array_equal(got, want)

    def test_oob_is_color_none(self):
        img = np.full((4, 4, 4), 200, np.uint8)
        # View hanging off the top-left corner.
        rrect = np.array([0.0, 0.0, 4.0, 4.0, 0.0], np.float32)
        got = np.asarray(
            sample_view_rgba(jnp.asarray(img), jnp.asarray(rrect), 4, 4, scale_to_view=False)
        )
        # Top-left quadrant is OOB -> zeros; bottom-right quadrant in-bounds.
        assert (got[0, 0] == 0).all()
        assert (got[3, 3] == 200).all()


class TestImageView:
    def test_identity_view_roundtrip(self):
        rng = np.random.default_rng(0)
        arr = random_image(rng, 8, 6)
        img = Image(arr)
        out = img.as_view().to_image().to_numpy()
        np.testing.assert_array_equal(out, arr)

    def test_subview_crop(self):
        rng = np.random.default_rng(1)
        arr = random_image(rng, 8, 8)
        img = Image(arr)
        crop = img.view(Rect.from_top_left(2.0, 3.0, 4.0, 2.0)).to_image().to_numpy()
        np.testing.assert_array_equal(crop, arr[3:5, 2:6])

    def test_nested_view_composition(self):
        rng = np.random.default_rng(2)
        arr = random_image(rng, 16, 16)
        img = Image(arr)
        outer = img.view(Rect.from_top_left(4.0, 4.0, 8.0, 8.0))
        inner = outer.view(Rect.from_top_left(2.0, 2.0, 4.0, 4.0))
        np.testing.assert_array_equal(
            inner.to_image().to_numpy(), arr[6:10, 6:10]
        )

    def test_rotation_composes(self):
        rng = np.random.default_rng(3)
        arr = random_image(rng, 9, 9)
        img = Image(arr)
        # Two quarter turns = half turn around the same center.
        q = RotatedRect.new(Rect.from_center(4.5, 4.5, 9.0, 9.0), TAU / 4)
        twice = img.view(q).view(
            RotatedRect.new(Rect.from_center(4.5, 4.5, 9.0, 9.0), TAU / 4)
        )
        half = img.view(RotatedRect.new(Rect.from_center(4.5, 4.5, 9.0, 9.0), TAU / 2))
        np.testing.assert_array_equal(
            twice.to_image().to_numpy(), half.to_image().to_numpy()
        )

    def test_rotated_views_reference_semantics(self):
        """Literal port of the reference's rotated_views test
        (crates/zaru/src/image/tests.rs:72-122)."""
        YELLOW = [255, 255, 0, 255]
        WHITE = [255, 255, 255, 255]
        RED = [255, 0, 0, 255]
        arr = np.array([[YELLOW, WHITE], [WHITE, RED]], np.uint8)
        img = Image(arr)
        full = RotatedRect.new(Rect.from_top_left(0.0, 0.0, 2.0, 2.0), 0.0)

        no_rot = img.view(full).to_image().to_numpy()
        np.testing.assert_array_equal(no_rot, arr)

        flip = img.view(
            RotatedRect.new(Rect.from_top_left(0.0, 0.0, 2.0, 2.0), TAU / 2)
        ).to_image().to_numpy()
        np.testing.assert_array_equal(flip, np.array([[RED, WHITE], [WHITE, YELLOW]]))

        right_angle = img.view(
            RotatedRect.new(Rect.from_top_left(0.0, 0.0, 2.0, 2.0), TAU / 4)
        )
        ra = right_angle.to_image().to_numpy()
        np.testing.assert_array_equal(ra[0, 0], WHITE)
        np.testing.assert_array_equal(ra[0, 1], RED)

        # 2 chained 90-degree rotations == the 180-degree flip.
        chained = right_angle.view(
            RotatedRect.new(Rect.from_top_left(0.0, 0.0, 2.0, 2.0), TAU / 4)
        ).to_image().to_numpy()
        np.testing.assert_array_equal(chained, np.array([[RED, WHITE], [WHITE, YELLOW]]))

        # Subview hanging off the rotated view's edge.
        bot_right = right_angle.view(Rect.from_top_left(-1.0, 1.0, 2.0, 2.0))
        assert bot_right.get(0, 0) == Color.NONE
        assert bot_right.get(1, 0) == Color(255, 255, 0, 255)

    def test_single_pixel_get(self):
        arr = np.zeros((3, 3, 4), np.uint8)
        arr[1, 2] = [9, 8, 7, 255]
        img = Image(arr)
        assert img.as_view().get(2, 1) == Color(9, 8, 7, 255)
        # OOB via oversized view.
        big = img.view(Rect.from_top_left(-1.0, -1.0, 5.0, 5.0))
        assert big.get(0, 0) == Color.NONE


class TestViewToTensor:
    def test_color_mapping_range(self):
        img = np.zeros((4, 4, 4), np.uint8)
        img[:, :2] = 255
        rrect = np.array([2.0, 2.0, 4.0, 4.0, 0.0], np.float32)
        t = np.asarray(view_to_tensor(jnp.asarray(img), jnp.asarray(rrect), 4, 4, -1.0, 1.0))
        assert t.shape == (1, 3, 4, 4)
        assert t.max() == pytest.approx(1.0)
        assert t.min() == pytest.approx(-1.0)

    def test_nhwc_layout(self):
        img = np.random.default_rng(0).integers(0, 255, (4, 4, 4), np.uint8)
        rrect = np.array([2.0, 2.0, 4.0, 4.0, 0.0], np.float32)
        a = np.asarray(view_to_tensor(jnp.asarray(img), jnp.asarray(rrect), 4, 4, 0.0, 1.0, "NCHW"))
        b = np.asarray(view_to_tensor(jnp.asarray(img), jnp.asarray(rrect), 4, 4, 0.0, 1.0, "NHWC"))
        np.testing.assert_array_equal(a[0].transpose(1, 2, 0), b[0])
