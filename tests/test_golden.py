"""Golden-output regression tests.

The semantic-invariant tests (confidence >= 0.8, |angle| < 5 deg, ...) catch
gross breakage but not numeric drift in decode/sampling math. These tests
pin the exact recorded outputs of the verified pipeline on the fixture
photos (SURVEY.md §4: "bit-closeness comparisons against recorded reference
outputs"). Regenerate deliberately with ``python tests/regen_goldens.py``.

Tolerances: goldens were recorded on XLA CPU; re-runs on the same backend
are deterministic, so a tight 1e-4-pixel band is used (coordinates are in
image pixels, O(100)). A failure here means the numeric path changed —
either fix the regression or regenerate with justification.
"""

import os

import numpy as np
import pytest

from regen_goldens import GOLDEN_PATH, GOLDEN_PATH_TPU, compute_goldens


@pytest.fixture(scope="module")
def recorded():
    """The golden set matching the backend the suite runs on: goldens.npz
    (CPU, always present) or goldens_tpu.npz (recorded on the real chip
    with ``python tests/regen_goldens.py --tpu``; catches TPU-specific
    compiler/numeric drift the CPU goldens can't see)."""
    import jax

    if jax.default_backend() == "tpu":
        if not os.path.exists(GOLDEN_PATH_TPU):
            pytest.skip(
                "no TPU golden set; record with python tests/regen_goldens.py --tpu"
            )
        path = GOLDEN_PATH_TPU
    else:
        path = GOLDEN_PATH
    assert os.path.exists(path), (
        "goldens missing; run python tests/regen_goldens.py"
    )
    with np.load(path) as z:
        return dict(z)


@pytest.fixture(scope="module")
def current():
    return compute_goldens()


def _check(recorded, current, keys, atol=1e-4):
    for k in keys:
        got = np.asarray(current[k], np.float32)
        want = np.asarray(recorded[k], np.float32)
        assert got.shape == want.shape, f"{k}: shape {got.shape} != {want.shape}"
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=atol, err_msg=k)


class TestGolden:
    def test_detection_short_range(self, recorded, current):
        _check(recorded, current,
               ["det_short_conf", "det_short_angle", "det_short_rect",
                "det_short_kps"])

    def test_detection_full_range(self, recorded, current):
        _check(recorded, current,
               ["det_full_conf", "det_full_angle", "det_full_rect",
                "det_full_kps"])

    def test_mesh_v1(self, recorded, current):
        _check(recorded, current, ["mesh_v1_pos", "mesh_v1_conf"])

    def test_mesh_v2(self, recorded, current):
        _check(recorded, current, ["mesh_v2_pos", "mesh_v2_conf"])

    def test_landmarks68(self, recorded, current):
        _check(recorded, current, ["lm68_peppa_pos", "lm68_faceonnx_pos"])

    def test_eye_chain(self, recorded, current):
        _check(recorded, current, ["eye_rect", "eye_pos", "eye_iris_center"])
