"""Procrustes / PnP property tests with seeded RNG, mirroring the
reference's recovery tests (procrustes.rs:253-484, pnp.rs:173-311)."""

import math

import numpy as np
import pytest

from zaru_tpu.pnp import Dlt, IntrinsicParams
from zaru_tpu.procrustes import ProcrustesAnalyzer


def rot_x(a):
    c, s = math.cos(a), math.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)


def rot_y(a):
    c, s = math.cos(a), math.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def rot_z(a):
    c, s = math.cos(a), math.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


@pytest.fixture
def cloud():
    rng = np.random.default_rng(1234)
    return rng.uniform(-1, 1, size=(40, 3)).astype(np.float32)


class TestProcrustes:
    def test_identity(self, cloud):
        res = ProcrustesAnalyzer(cloud).analyze(cloud)
        assert res.scale() == pytest.approx(1.0, abs=1e-5)
        np.testing.assert_allclose(res.rotation_matrix(), np.eye(3), atol=1e-4)
        np.testing.assert_allclose(res.translation(), 0.0, atol=1e-4)

    def test_translation(self, cloud):
        res = ProcrustesAnalyzer(cloud).analyze(cloud + [1.0, -2.0, 3.0])
        np.testing.assert_allclose(res.translation(), [1.0, -2.0, 3.0], atol=1e-4)
        assert res.scale() == pytest.approx(1.0, abs=1e-5)

    def test_scale(self, cloud):
        res = ProcrustesAnalyzer(cloud).analyze(cloud * 2.5)
        assert res.scale() == pytest.approx(2.5, abs=1e-4)

    @pytest.mark.parametrize(
        "rot", [rot_x(0.5), rot_y(-0.9), rot_z(2.0), rot_x(0.3) @ rot_y(1.1) @ rot_z(-0.4)]
    )
    def test_rotation(self, cloud, rot):
        data = cloud @ rot.T
        res = ProcrustesAnalyzer(cloud).analyze(data)
        np.testing.assert_allclose(res.rotation_matrix(), rot, atol=1e-4)

    def test_combined_with_jitter(self, cloud):
        rng = np.random.default_rng(99)
        rot = rot_y(0.7) @ rot_x(-0.2)
        data = (cloud @ rot.T) * 1.7 + [0.5, 0.25, -1.0]
        data += rng.normal(0, 0.005, data.shape).astype(np.float32)
        res = ProcrustesAnalyzer(cloud).analyze(data)
        assert res.scale() == pytest.approx(1.7, abs=0.02)
        np.testing.assert_allclose(res.rotation_matrix(), rot, atol=0.02)
        np.testing.assert_allclose(res.translation(), [0.5, 0.25, -1.0], atol=0.05)

    def test_transform_matrix_maps_reference(self, cloud):
        rot = rot_z(0.8)
        data = (cloud @ rot.T) * 0.5 + [0.1, 0.2, 0.3]
        res = ProcrustesAnalyzer(cloud).analyze(data)
        hom = np.concatenate([cloud, np.ones((len(cloud), 1), np.float32)], axis=1)
        mapped = (res.transform() @ hom.T).T[:, :3]
        np.testing.assert_allclose(mapped, data, atol=1e-3)

    def test_degenerate_collapsed_data(self, cloud):
        res = ProcrustesAnalyzer(cloud).analyze(np.zeros_like(cloud))
        np.testing.assert_allclose(res.rotation_matrix(), np.eye(3), atol=1e-6)

    def test_quaternion_unit(self, cloud):
        res = ProcrustesAnalyzer(cloud).analyze(cloud @ rot_y(1.2).T)
        q = res.rotation_quaternion()
        assert np.linalg.norm(q) == pytest.approx(1.0, abs=1e-5)
        # Rotation angle encoded in w: cos(theta/2).
        assert 2 * math.acos(abs(q[0])) == pytest.approx(1.2, abs=1e-3)

    @pytest.mark.parametrize(
        "rot,axis",
        [(rot_x, [1, 0, 0]), (rot_y, [0, 1, 0]), (rot_z, [0, 0, 1])],
    )
    def test_quaternion_near_180_about_each_axis(self, cloud, rot, axis):
        """Shepperd fallback: a ~180° rotation must yield the quaternion
        for the CORRECT axis — the old x-diagonal-only branch returned
        180°-about-X for 180° about Y or Z."""
        res = ProcrustesAnalyzer(cloud).analyze(cloud @ rot(math.pi).T)
        q = res.rotation_quaternion()
        assert np.linalg.norm(q) == pytest.approx(1.0, abs=1e-5)
        assert abs(q[0]) == pytest.approx(0.0, abs=1e-3)  # theta ~= pi
        got_axis = np.abs(q[1:]) / np.linalg.norm(q[1:])
        np.testing.assert_allclose(got_axis, axis, atol=1e-3)

    @pytest.mark.parametrize("seed", [7, 11, 99])
    def test_quaternion_180_stable_under_f32_recovery(self, seed):
        """A Kabsch-RECOVERED 180° matrix carries float32 noise: its
        trace can land just above -1, which put the old w-threshold form
        (w = sqrt(eps)/2 > 1e-6) on the catastrophically-cancelling
        branch and returned garbage axes. Shepperd's branch-on-largest
        selection must stay exact for any cloud."""
        rng = np.random.default_rng(seed)
        cloud = rng.uniform(-1, 1, size=(30, 3)).astype(np.float32)
        res = ProcrustesAnalyzer(cloud).analyze(cloud @ rot_z(math.pi).T)
        q = res.rotation_quaternion()
        assert abs(q[0]) == pytest.approx(0.0, abs=1e-3), q
        np.testing.assert_allclose(
            np.abs(q[1:]) / np.linalg.norm(q[1:]), [0, 0, 1], atol=1e-3
        )

    def test_rejects_wrong_length(self, cloud):
        with pytest.raises(AssertionError):
            ProcrustesAnalyzer(cloud).analyze(cloud[:-1])


class TestDlt:
    def _project(self, points, rot, t, intrinsics):
        cam = (points @ rot.T) + t
        proj = (intrinsics.to_matrix()[:, :3] @ cam.T).T
        return proj[:, :2] / proj[:, 2:3]

    def test_recovers_pose(self):
        rng = np.random.default_rng(42)
        pts = rng.uniform(-1, 1, size=(12, 3)).astype(np.float32)
        pts[:, 2] += 5.0  # in front of the camera
        rot = rot_y(0.3) @ rot_x(-0.15)
        t = np.array([0.2, -0.1, 1.0], np.float32)
        intr = IntrinsicParams(1.0, (1.0, 1.0))
        uv = self._project(pts, rot, t, intr)

        out = Dlt(pts).solve(uv)
        # DLT recovers P = K[R|t] up to scale; with K=I the rotation should
        # match directly.
        np.testing.assert_allclose(out.rotation_matrix, rot, atol=5e-3)
        np.testing.assert_allclose(out.translation, t, atol=5e-2)

    def test_needs_six_points(self):
        with pytest.raises(AssertionError, match="at least 6"):
            Dlt(np.zeros((5, 3), np.float32))

    def test_intrinsics_matrix(self):
        intr = IntrinsicParams(2.0, (0.5, 0.25))
        intr.set_principal_point((10.0, 20.0))
        m = intr.to_matrix()
        assert m[0, 0] == 4.0 and m[1, 1] == 8.0
        assert m[0, 2] == 10.0 and m[1, 2] == 20.0


class TestFaceMeshProcrustesYaw:
    """Mirrors the reference's mediapipe test that checks Procrustes-derived
    yaw from the canonical face mesh (mediapipe.rs:608-625)."""

    def test_yaw_neutral_on_fixture(self, sad_linus_cropped):
        from zaru_tpu.face.landmark.mediapipe import FaceMeshV1, reference_positions
        from zaru_tpu.landmark import Estimator

        est = Estimator(FaceMeshV1())
        res = est.estimate(sad_linus_cropped)
        assert res.confidence() > 0.9

        ref = reference_positions().copy()
        # Flip reference Y to image coordinates (y-down).
        ref[:, 1] *= -1.0
        analyzer = ProcrustesAnalyzer(ref)
        result = analyzer.analyze(res.landmarks_mut().positions())
        q = result.rotation_quaternion()
        # Yaw (rotation about vertical axis) should be small for a frontal
        # face: |yaw| < 10 degrees.
        w, x, y, z = q
        yaw = math.degrees(math.atan2(2 * (w * y + x * z), 1 - 2 * (y * y + z * z)))
        assert abs(yaw) < 10.0, yaw
