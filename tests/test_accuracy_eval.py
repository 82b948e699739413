"""End-to-end accuracy budgets: the equivariance transform sweep
(zaru_tpu.eval; VERDICT r4 weak #2 — convert triangulated parity into a
measured px number). The full sweep's pinned results live in PARITY.md;
these tests run a reduced sweep with headroomed budgets so refactors that
break the sampling/geometry/decode chain fail loudly.

Budget rationale: the identity transform must be EXACT (the warp
reproduces the frame bit-for-bit, so any deviation would be
nondeterminism or state leakage). Rotation/scale deviations are dominated
by CNN sensitivity to the nearest-neighbor resampled input (measured
~1.5-2.5 px mean on the 535 px fixture face, 2026-08-20); budgets sit at
~2x those measurements.
"""

import numpy as np
import pytest

from zaru_tpu import eval as ev


@pytest.fixture(scope="module")
def cropped_frame():
    from zaru_tpu.assets import fixture_path
    from zaru_tpu.image import Image

    return np.asarray(
        Image.load(fixture_path("sad_linus_cropped.jpg")).to_numpy()
    )


REDUCED = (
    ev.Transform("identity"),
    ev.Transform("rot+10", angle_deg=10.0),
    ev.Transform("scale0.85", scale=0.85),
)


class TestGeometryChain:
    def test_identity_warp_is_bitexact(self, cropped_frame):
        rrect = ev.transform_rrect(*cropped_frame.shape[:2], ev.Transform("identity"))
        np.testing.assert_array_equal(
            ev.warp_image(cropped_frame, rrect), cropped_frame
        )

    def test_map_back_inverts_known_points(self, cropped_frame):
        """warp + map_points_back round-trips analytically-known points to
        within the sampler's quantization (<= ~0.8 px at scale 0.85)."""
        h, w = cropped_frame.shape[:2]
        t = ev.Transform("combo", angle_deg=17.0, scale=0.85, shift=(11.0, -7.0))
        rrect = ev.transform_rrect(h, w, t)
        # Forward-map source points into warped-frame coords analytically:
        # invert the continuous map used by map_points_back.
        from zaru_tpu.geometry import rrect_transform_in

        src = np.array([[w / 2, h / 2], [w / 4, h / 3], [3 * w / 4, 2 * h / 3]])
        ratio = np.array([rrect[2] / w, rrect[3] / h], np.float32)
        warped_pts = np.asarray(rrect_transform_in(rrect, src.astype(np.float32))) / ratio
        back = ev.map_points_back(warped_pts, rrect, (h, w))
        np.testing.assert_allclose(back, src, atol=1e-2)


class TestFaceMeshBudget:
    def test_face_mesh_sweep_budget(self, cropped_frame):
        run = ev.RUNNERS["face_mesh"]()
        rows = ev.evaluate_runner(run, cropped_frame, REDUCED)
        by_name = {r["transform"]: r for r in rows}
        assert all(r["valid"] for r in rows)
        # Identity: exact by construction (deterministic pipeline).
        assert by_name["identity"]["max_px"] == 0.0
        # Rotation/scale: CNN-sensitivity-dominated; 2x measured headroom.
        for name, mean_budget, p95_budget in (
            ("rot+10", 4.5, 9.0),
            ("scale0.85", 4.5, 9.0),
        ):
            row = by_name[name]
            assert row["mean_px"] <= mean_budget, (name, row)
            assert row["p95_px"] <= p95_budget, (name, row)


class TestHostPathBudget:
    def test_multipie68_sweep_budget(self, cropped_frame):
        """The host Detector+Estimator call stack (SURVEY §3.2+§3.3) holds
        the same class of budget."""
        run = ev.RUNNERS["multipie68_peppa"]()
        rows = ev.evaluate_runner(run, cropped_frame, REDUCED)
        by_name = {r["transform"]: r for r in rows}
        assert all(r["valid"] for r in rows)
        assert by_name["identity"]["max_px"] == 0.0
        for name in ("rot+10", "scale0.85"):
            assert by_name[name]["mean_px"] <= 6.0, by_name[name]
            assert by_name[name]["p95_px"] <= 12.0, by_name[name]
