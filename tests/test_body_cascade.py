"""Body-pose path, end-to-end with stub weights.

The pose model blobs are missing from the reference checkout itself
(reference 3rdparty/onnx/.MISSING_LARGE_BLOBS:1-5), so these tests run the
COMPLETE body path — host Detector/Estimator drive loops and the fused
BodyTracker cascade — against tiny constant-output stand-ins authored with
the ONNX writer (tests/stub_models.py). Everything downstream of the model
(anchors, SSD decode, keypoint ROI seeding, landmark extraction, tracking
state machine) is the real production code; dropping the real blobs into
assets/onnx/ activates the identical pipeline.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import stub_models


@pytest.fixture(scope="module")
def stub_env(tmp_path_factory):
    """Point ZARU_TPU_MODELS at stub pose blobs; undo cnn caches after."""
    import os

    from zaru_tpu.body import detection as bd
    from zaru_tpu.body import landmark as bl

    d = tmp_path_factory.mktemp("stub_onnx")
    stub_models.write_stub_pose_models(d)
    old = os.environ.get("ZARU_TPU_MODELS")
    os.environ["ZARU_TPU_MODELS"] = str(d)
    bd._cnn.cache_clear()
    bl._load_cnn.cache_clear()
    try:
        yield d
    finally:
        if old is None:
            os.environ.pop("ZARU_TPU_MODELS", None)
        else:
            os.environ["ZARU_TPU_MODELS"] = old
        bd._cnn.cache_clear()
        bl._load_cnn.cache_clear()


def _frame(h=240, w=320):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.integers(0, 256, (h, w, 4), np.uint8))


class TestHostBodyPath:
    def test_pose_detector(self, stub_env):
        from zaru_tpu.body.detection import Keypoint, PoseNetwork
        from zaru_tpu.detection import Detector
        from zaru_tpu.image import Image

        img = Image.from_array(np.asarray(_frame()))
        dets = list(Detector(PoseNetwork()).detect(img))
        assert len(dets) == 1
        d = dets[0]
        assert d.confidence() == pytest.approx(1 / (1 + np.exp(-4.0)), abs=1e-3)
        # Anchor 1200 = layer-1 cell (12, 21) of 28x28; fit square side 320,
        # top-left (0, -40): center_px = (100, 172) -> image (142.86, 205.71).
        np.testing.assert_allclose(
            d.bounding_rect().center(), [142.857, 205.714], atol=0.01
        )
        np.testing.assert_allclose(
            d.bounding_rect().size(), [80 * 320 / 224] * 2, atol=0.01
        )
        hips = d.keypoint(Keypoint.HIPS)
        np.testing.assert_allclose(hips, [142.857, 234.286], atol=0.01)

    def test_pose_landmarker(self, stub_env):
        from zaru_tpu.body.landmark import LiteNetwork, NUM_TOTAL
        from zaru_tpu.image import Image
        from zaru_tpu.landmark import Estimator

        img = Image.from_array(np.asarray(_frame(256, 256)))
        est = Estimator(LiteNetwork()).estimate(img)
        assert est.presence() == pytest.approx(0.95, abs=1e-5)
        pos = est.landmarks_mut().positions()
        assert pos.shape == (NUM_TOTAL, 3)
        # Input 256x256 == network input: positions equal the stub points.
        np.testing.assert_allclose(
            pos[:, 0:2], stub_models.stub_pose_points(), atol=1e-3
        )
        vis = est.landmarks_mut().visibility
        np.testing.assert_allclose(
            vis, np.full(NUM_TOTAL, 1 / (1 + np.exp(-2.0))), atol=1e-5
        )


class TestFusedBodyCascade:
    def test_track_and_hold(self, stub_env):
        from zaru_tpu.body.landmark import LandmarkIdx, NUM_POSE
        from zaru_tpu.pipeline import BodyTracker

        tracker = BodyTracker(max_bodies=2)
        state = tracker.init_state()
        frame = _frame()

        outs = []
        for _ in range(4):
            state, out = tracker.run_frame(state, frame)
            outs.append(out)

        for t, out in enumerate(outs):
            assert bool(np.asarray(out["valid"])[0]), f"frame {t} lost"
            assert not bool(np.asarray(out["valid"])[1])
            assert float(out["pose_flag"][0]) == pytest.approx(0.95, abs=1e-4)
        out = outs[-1]
        assert out["landmarks"].shape == (2, 39, 3)
        assert out["pose_landmarks"].shape == (2, NUM_POSE, 3)
        np.testing.assert_allclose(
            np.asarray(out["visibility"][0]),
            np.full(39, 1 / (1 + np.exp(-2.0))),
            atol=1e-4,
        )
        # Upright stub body: shoulders above hips in image coords, and the
        # residual rotation stays ~0 so the ROI stays unrotated.
        lms = np.asarray(out["landmarks"][0])
        mid_shoulder = (lms[LandmarkIdx.LEFT_SHOULDER] + lms[LandmarkIdx.RIGHT_SHOULDER]) / 2
        mid_hip = (lms[LandmarkIdx.LEFT_HIP] + lms[LandmarkIdx.RIGHT_HIP]) / 2
        assert mid_shoulder[1] < mid_hip[1]
        assert abs(float(np.asarray(out["rois"])[0, 4])) < 1e-3
        # Constant stub output -> the ROI/landmark loop reaches a fixed
        # point: the last two frames agree.
        np.testing.assert_allclose(
            np.asarray(outs[-1]["landmarks"][0]),
            np.asarray(outs[-2]["landmarks"][0]),
            atol=0.5,
        )

    def test_roi_seeded_from_hips(self, stub_env):
        from zaru_tpu.body.detection import PoseNetwork
        from zaru_tpu.pipeline import BodyTracker
        from zaru_tpu.pipeline import _ops

        tracker = BodyTracker(max_bodies=1)
        frame = _frame()
        res = tracker.det_cnn.input_resolution()
        fit, fit_rrect = _ops.full_frame_fit(frame, res)
        outputs = tracker.det_cnn.apply_on_view(
            tracker.params["det"], frame, fit_rrect
        )
        boxes, conf, kps, angles = PoseNetwork().decode_device(outputs, 0.5)
        i = int(np.argmax(np.asarray(conf)))
        assert i == stub_models.POSE_DET_ANCHOR
        rois, valid = tracker._detect(tracker.params, frame)
        assert bool(np.asarray(valid)[0])
        roi = np.asarray(rois)[0]
        # Centered on the hips keypoint (image coords), square with side
        # 2*dist(hips, scale_pt)*1.25; upright -> angle 0.
        np.testing.assert_allclose(roi[0:2], [142.857, 234.286], atol=0.01)
        np.testing.assert_allclose(roi[2:4], [2 * 80 * (320 / 224) * 1.25] * 2,
                                   atol=0.05)
        assert abs(roi[4]) < 1e-5


class TestGatedBodyCascade:
    def test_gated_batched(self, stub_env):
        """Batch gate + MXU fast sampling over streams x slots."""
        from zaru_tpu.pipeline import BodyTracker

        tracker = BodyTracker(max_bodies=2)
        state = tracker.init_state(batch=2)
        frames = jnp.stack([_frame(), _frame()])
        for _ in range(3):
            state, out = tracker.run_frames_gated(state, frames)
        valid = np.asarray(out["valid"])
        assert valid[:, 0].all() and not valid[:, 1].any()
        assert out["pose_landmarks"].shape == (2, 2, 33, 3)
        assert np.allclose(np.asarray(out["pose_flag"])[:, 0], 0.95, atol=1e-3)
