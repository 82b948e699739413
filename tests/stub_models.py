"""Stub ONNX models standing in for blobs missing upstream.

The reference checkout itself lacks five model blobs (reference
3rdparty/onnx/.MISSING_LARGE_BLOBS:1-5) and this environment has no
network egress, so the body-pose wrappers and cascade are exercised with
tiny constant-output models authored via :mod:`zaru_tpu.onnx.writer`.
The stubs ignore the image and emit crafted logits/coordinates through
bias terms, so every decode path (anchors, sigmoid, keypoints, ROI
seeding, landmark extraction) runs exactly as it would with real weights.

Usage: ``write_stub_pose_models(dir)`` then point ``ZARU_TPU_MODELS`` at
``dir``.
"""

import numpy as np

from zaru_tpu.onnx.writer import OnnxWriter

POSE_DET_ANCHOR = 1200  # the single anchor the stub detector fires on
POSE_DET_INPUT = 224
POSE_LM_INPUT = 256

# Stub "standing person" pose in pose-landmark input coords (x, y), used by
# the 39-point landmark stub. Indices follow body/landmark.rs:83-117.
def stub_pose_points() -> np.ndarray:
    # The vertical spread is exactly 160 = 256 / 1.6 so the tracking loop's
    # ROI re-derivation (landmark bbox grown by padding 0.3 -> size x1.6,
    # landmark.rs:488-494) is a fixed point of the constant stub output —
    # the tracked ROI holds steady frame over frame. The bbox center sits
    # at the view center (128, 128) so there is no translation drift either.
    pts = np.zeros((39, 2), np.float32)
    cx = POSE_LM_INPUT / 2.0
    # Head cluster (0-10)
    for i in range(11):
        pts[i] = (cx + (i - 5) * 3.0, 48.0 + (i % 3) * 2.0)
    pts[11] = (cx - 30.0, 73.0)   # left shoulder
    pts[12] = (cx + 30.0, 73.0)   # right shoulder
    pts[13] = (cx - 38.0, 98.0)   # left elbow
    pts[14] = (cx + 38.0, 98.0)
    pts[15] = (cx - 42.0, 123.0)  # left wrist
    pts[16] = (cx + 42.0, 123.0)
    for i in range(17, 23):  # hands
        side = -1.0 if i % 2 else 1.0
        pts[i] = (cx + side * 45.0, 128.0 + (i - 17) * 1.5)
    pts[23] = (cx - 18.0, 138.0)  # left hip
    pts[24] = (cx + 18.0, 138.0)  # right hip
    pts[25] = (cx - 20.0, 168.0)  # knees
    pts[26] = (cx + 20.0, 168.0)
    pts[27] = (cx - 21.0, 198.0)  # ankles
    pts[28] = (cx + 21.0, 198.0)
    for i in range(29, 33):  # heels/feet
        side = -1.0 if i % 2 else 1.0
        pts[i] = (cx + side * 23.0, 208.0)
    for i in range(33, 39):  # aux landmarks
        pts[i] = (cx + (i - 36) * 10.0, 118.0)
    return pts


def _constant_head(w: OnnxWriter, flat_in: str, name: str, bias: np.ndarray, shape):
    """Gemm with zero weights + crafted bias -> Reshape to `shape`."""
    n = int(np.prod(bias.shape))
    w.initializer(f"{name}_w", np.zeros((3, n), np.float32))
    w.initializer(f"{name}_b", bias.reshape(n).astype(np.float32))
    w.node("Gemm", [flat_in, f"{name}_w", f"{name}_b"], [f"{name}_flat"])
    w.initializer(f"{name}_shape", np.asarray(shape, np.int64))
    w.node("Reshape", [f"{name}_flat", f"{name}_shape"], [name])
    w.output(name, shape)


def _stub_base(input_hw: int) -> tuple[OnnxWriter, str]:
    w = OnnxWriter(graph_name="stub")
    w.input("input", (1, 3, input_hw, input_hw))
    w.node("GlobalAveragePool", ["input"], ["gap"])
    w.initializer("flat_shape", np.asarray([1, 3], np.int64))
    w.node("Reshape", ["gap", "flat_shape"], ["flat"])
    return w, "flat"


def build_pose_detection_stub() -> bytes:
    """pose_detection.onnx stand-in: 2254 anchors ((2,28,28)+(2,14,14)+
    (6,7,7), body/detection.rs:48-55), 12 box params, one confident
    detection at anchor POSE_DET_ANCHOR with hips/scale keypoints."""
    n_anchors = 2 * 28 * 28 + 2 * 14 * 14 + 6 * 7 * 7
    assert n_anchors == 2254

    boxes = np.zeros((n_anchors, 12), np.float32)
    # (dx, dy, w, h, then 4 keypoints relative to the anchor center):
    # kp0 = hips slightly below center, kp1 = scale/rotation point above.
    boxes[POSE_DET_ANCHOR] = [0, 0, 80, 80, 0, 20, 0, -60, 8, 0, -8, 0]
    conf = np.full((n_anchors, 1), -8.0, np.float32)
    conf[POSE_DET_ANCHOR] = 4.0

    w, flat = _stub_base(POSE_DET_INPUT)
    _constant_head(w, flat, "boxes", boxes, (1, n_anchors, 12))
    _constant_head(w, flat, "conf", conf, (1, n_anchors, 1))
    return w.serialize()


def build_pose_landmark_stub() -> bytes:
    """pose_landmark_{lite,full}.onnx stand-in: 39x5 screen landmarks +
    pose flag + an extra head (so output selection by index [0, 1] is
    exercised, body/landmark.rs:149,175)."""
    screen = np.zeros((39, 5), np.float32)
    screen[:, 0:2] = stub_pose_points()
    screen[:, 2] = -5.0  # z
    screen[:, 3] = 2.0   # visibility logit
    screen[:, 4] = 3.0   # presence logit

    w, flat = _stub_base(POSE_LM_INPUT)
    _constant_head(w, flat, "ld_3d", screen, (1, 195))
    _constant_head(w, flat, "output_poseflag", np.asarray([0.95], np.float32), (1, 1))
    _constant_head(w, flat, "unused_head", np.zeros(5, np.float32), (1, 5))
    return w.serialize()


def build_palm_detection_full_stub() -> bytes:
    """palm_detection_full.onnx stand-in: 2016 anchors (2×24×24 + 6×12×12,
    hand/detection.rs:115-120), 18 box params, NO detection fired (every
    conf logit deeply negative) — the gated golden's contract is that
    noise input must not produce confident palms."""
    n_anchors = 2 * 24 * 24 + 6 * 12 * 12
    assert n_anchors == 2016

    boxes = np.zeros((n_anchors, 18), np.float32)
    conf = np.full((n_anchors, 1), -8.0, np.float32)

    w, flat = _stub_base(192)
    _constant_head(w, flat, "boxes", boxes, (1, n_anchors, 18))
    _constant_head(w, flat, "conf", conf, (1, n_anchors, 1))
    return w.serialize()


def build_hand_landmark_full_stub() -> bytes:
    """hand_landmark_full.onnx stand-in: screen landmarks [1,63] +
    presence [1,1] + handedness [1,1] + world landmarks [1,63]
    (hand/landmark.rs:299-321)."""
    pts = np.zeros((21, 3), np.float32)
    pts[:, 0] = 112.0 + (np.arange(21) - 10) * 4.0
    pts[:, 1] = 80.0 + (np.arange(21) % 5) * 20.0
    pts[:, 2] = -2.0

    w, flat = _stub_base(224)
    _constant_head(w, flat, "ld", pts, (1, 63))
    _constant_head(w, flat, "presence", np.asarray([0.9], np.float32), (1, 1))
    _constant_head(w, flat, "handed", np.asarray([0.7], np.float32), (1, 1))
    _constant_head(w, flat, "world", np.zeros(63, np.float32), (1, 63))
    return w.serialize()


def write_stub_pose_models(directory) -> None:
    import os

    det = build_pose_detection_stub()
    lm = build_pose_landmark_stub()
    for name, data in [
        ("pose_detection.onnx", det),
        ("pose_landmark_lite.onnx", lm),
        ("pose_landmark_full.onnx", lm),
    ]:
        with open(os.path.join(directory, name), "wb") as f:
            f.write(data)


def write_stub_missing_models(directory) -> None:
    """ALL five missing-upstream blobs as stubs — the CI-style run that
    proves every gated real-weight golden auto-activates
    (VERDICT r4 #8)."""
    import os

    write_stub_pose_models(directory)
    for name, data in [
        ("palm_detection_full.onnx", build_palm_detection_full_stub()),
        ("hand_landmark_full.onnx", build_hand_landmark_full_stub()),
    ]:
        with open(os.path.join(directory, name), "wb") as f:
            f.write(data)
