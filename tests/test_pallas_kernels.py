"""Pallas kernel parity tests (interpret mode on CPU; the same kernels
compile for TPU via Mosaic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zaru_tpu.ops.pallas_kernels import (
    letterbox_sample_pallas,
    rgb_to_yuv,
    rgb_to_yuv_pallas,
    yuv_to_rgb,
)
from zaru_tpu.ops.sampling import view_to_tensor


class TestLetterboxPallas:
    @pytest.mark.parametrize(
        "img_wh,rect",
        [
            ((64, 48), (32.0, 24.0, 64.0, 64.0)),  # grown-to-square letterbox
            ((100, 100), (50.0, 50.0, 100.0, 100.0)),  # exact fit
            ((80, 60), (40.0, 30.0, 80.0, 80.0)),
        ],
    )
    def test_matches_xla_sampler(self, img_wh, rect):
        w, h = img_wh
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.integers(0, 256, (h, w, 4), np.uint8))
        rrect = jnp.asarray(list(rect) + [0.0], jnp.float32)

        ref = view_to_tensor(img, rrect, 32, 32, -1.0, 1.0)
        got = letterbox_sample_pallas(
            img, np.asarray(rect, np.float32), 32, 32, -1.0, 1.0, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_oob_zero_mapped(self):
        img = jnp.full((10, 10, 4), 200, jnp.uint8)
        # Letterboxed rect hanging off the image: OOB pixels map like black.
        rect = np.asarray([5.0, 5.0, 20.0, 20.0], np.float32)
        got = np.asarray(
            letterbox_sample_pallas(img, rect, 16, 16, -1.0, 1.0, interpret=True)
        )
        assert got.min() == pytest.approx(-1.0)


class TestYuv:
    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        rgb = rng.uniform(0, 1, (16, 24, 3)).astype(np.float32)
        back = np.asarray(yuv_to_rgb(rgb_to_yuv(jnp.asarray(rgb))))
        np.testing.assert_allclose(back, rgb, atol=1e-5)

    def test_y_of_gray(self):
        gray = jnp.full((4, 4, 3), 0.5, jnp.float32)
        yuv = np.asarray(rgb_to_yuv(gray))
        np.testing.assert_allclose(yuv[..., 0], 0.5, atol=1e-6)
        np.testing.assert_allclose(yuv[..., 1:], 0.0, atol=1e-6)

    def test_pallas_matches_xla(self):
        rng = np.random.default_rng(2)
        rgb = jnp.asarray(rng.uniform(0, 1, (130, 64, 3)).astype(np.float32))
        ref = np.asarray(rgb_to_yuv(rgb))
        got = np.asarray(rgb_to_yuv_pallas(rgb, interpret=True, block_rows=32))
        np.testing.assert_allclose(got, ref, atol=1e-6)
