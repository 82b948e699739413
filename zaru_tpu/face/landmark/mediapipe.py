"""MediaPipe Face Mesh landmark networks (468/478 points).

TPU-native counterpart of reference
crates/zaru/src/face/landmark/mediapipe.rs.
"""

from __future__ import annotations

import enum
from functools import lru_cache

import numpy as np

from ...assets import model_path
from ...geometry import RotatedRect, signed_angle_to_x
from ...landmark import LandmarkNetwork, Landmarks
from ...nn import Cnn, CnnInputShape, ColorMapper, NeuralNetwork
from ...num import sigmoid

__all__ = [
    "FaceMeshV1",
    "FaceMeshV2",
    "LandmarkResultV1",
    "LandmarkResultV2",
    "LandmarkIdx",
    "reference_positions",
]


class LandmarkIdx(enum.IntEnum):
    """Landmark indices of the canonical 468-point face mesh
    (mediapipe.rs:530-545)."""

    MOUTH_LEFT = 78
    MOUTH_RIGHT = 308
    MOUTH_TOP = 13
    MOUTH_BOTTOM = 14
    LEFT_EYE_OUTER_CORNER = 33
    LEFT_EYE_INNER_CORNER = 133
    LEFT_EYE_TOP = 159
    LEFT_EYE_BOTTOM = 145
    RIGHT_EYE_INNER_CORNER = 362
    RIGHT_EYE_OUTER_CORNER = 263
    RIGHT_EYE_TOP = 386
    RIGHT_EYE_BOTTOM = 374
    RIGHT_EYEBROW_INNER_CORNER = 295
    LEFT_EYEBROW_INNER_CORNER = 65


LEFT_EYE_CONTOUR = [33, 246, 161, 160, 159, 158, 157, 173, 133, 155, 154, 153, 145, 144, 163, 7]
RIGHT_EYE_CONTOUR = [362, 398, 384, 385, 386, 387, 388, 466, 263, 249, 390, 373, 374, 380, 381, 382]


def _rotation_radians(landmarks: Landmarks) -> float:
    """Clockwise face rotation from the outer eye corners
    (mediapipe.rs:146-160)."""
    left = landmarks.positions()[LandmarkIdx.LEFT_EYE_OUTER_CORNER, :2]
    right = landmarks.positions()[LandmarkIdx.RIGHT_EYE_OUTER_CORNER, :2]
    return float(signed_angle_to_x(right - left))


def _eye_rect(landmarks: Landmarks, indices, radians: float) -> RotatedRect:
    pts = landmarks.positions()[list(indices), :2]
    return RotatedRect.bounding(radians, pts)


class _ResultBase:
    NUM_LANDMARKS = 468

    def __init__(self):
        self.landmarks = Landmarks(self.NUM_LANDMARKS)
        self.face_flag = 0.0

    def landmarks_mut(self) -> Landmarks:
        return self.landmarks

    def confidence(self) -> float:
        """Face-present confidence (sigmoid of the model's face flag)."""
        return self.face_flag

    def rotation_radians(self) -> float:
        return _rotation_radians(self.landmarks)

    def angle_radians(self) -> float:
        return self.rotation_radians()

    def left_eye(self) -> RotatedRect:
        """RotatedRect containing the left eye (mediapipe.rs:163-180)."""
        return _eye_rect(
            self.landmarks,
            [
                LandmarkIdx.LEFT_EYE_BOTTOM,
                LandmarkIdx.LEFT_EYE_OUTER_CORNER,
                LandmarkIdx.LEFT_EYE_INNER_CORNER,
                LandmarkIdx.LEFT_EYE_TOP,
            ],
            self.rotation_radians(),
        )

    def right_eye(self) -> RotatedRect:
        return _eye_rect(
            self.landmarks,
            [
                LandmarkIdx.RIGHT_EYE_BOTTOM,
                LandmarkIdx.RIGHT_EYE_INNER_CORNER,
                LandmarkIdx.RIGHT_EYE_OUTER_CORNER,
                LandmarkIdx.RIGHT_EYE_TOP,
            ],
            self.rotation_radians(),
        )


class LandmarkResultV1(_ResultBase):
    """468 landmarks + face flag (mediapipe.rs:119-265)."""


class LandmarkResultV2(_ResultBase):
    """478 landmarks (468 mesh + 2×5 iris) + face flag + tongue-out
    blendshape (mediapipe.rs:277-470)."""

    NUM_LANDMARKS = 478

    def __init__(self):
        super().__init__()
        self.tongue_out = 0.0

    def mesh_landmarks(self) -> np.ndarray:
        return self.landmarks.positions()[: LandmarkResultV1.NUM_LANDMARKS]

    def left_iris(self) -> np.ndarray:
        """[5,3]: center then left/right/top/bottom (mediapipe.rs:345-357)."""
        s = LandmarkResultV1.NUM_LANDMARKS
        return self.landmarks.positions()[s : s + 5]

    def right_iris(self) -> np.ndarray:
        s = LandmarkResultV1.NUM_LANDMARKS + 5
        return self.landmarks.positions()[s : s + 5]

    def left_eye_contour(self) -> np.ndarray:
        return self.landmarks.positions()[LEFT_EYE_CONTOUR]

    def right_eye_contour(self) -> np.ndarray:
        return self.landmarks.positions()[RIGHT_EYE_CONTOUR]


@lru_cache(maxsize=None)
def _cnn_v1(compute_dtype=None) -> Cnn:
    return Cnn(
        NeuralNetwork.load(model_path("face_landmark.onnx"), compute_dtype=compute_dtype),
        CnnInputShape.NCHW,
        ColorMapper.linear(-1.0, 1.0),
    )


@lru_cache(maxsize=None)
def _cnn_v2(compute_dtype=None) -> Cnn:
    return Cnn(
        NeuralNetwork.load(
            model_path("face_landmarks_detector.onnx"), compute_dtype=compute_dtype
        ),
        CnnInputShape.NCHW,
        ColorMapper.linear(-1.0, 1.0),
    )


class FaceMeshV1(LandmarkNetwork):
    """MediaPipe Face Mesh (192×192 → 468×3 + face flag)
    (mediapipe.rs:41-72). Input must be an upright face crop; use
    LandmarkTracker for rotation following."""

    def __init__(self, compute_dtype=None):
        self._compute_dtype = compute_dtype

    def cnn(self) -> Cnn:
        return _cnn_v1(self._compute_dtype)

    def init_estimate(self) -> LandmarkResultV1:
        return LandmarkResultV1()

    def extract(self, outputs, estimate: LandmarkResultV1) -> None:
        estimate.face_flag = float(sigmoid(outputs[1].reshape(())))
        coords = outputs[0].reshape(-1, 3)[: estimate.NUM_LANDMARKS]
        estimate.landmarks.set_positions(coords)

    def decode_device(self, outputs):
        """Traced decode → (positions [468,3], confidence scalar)."""
        import jax

        coords = outputs[0].reshape(-1, 3)
        conf = jax.nn.sigmoid(outputs[1].reshape(()))
        return coords, conf


class FaceMeshV2(LandmarkNetwork):
    """Face Mesh v2 (256×256 → 478×3, face flag, tongueOut)
    (mediapipe.rs:81-115)."""

    def __init__(self, compute_dtype=None):
        self._compute_dtype = compute_dtype

    def cnn(self) -> Cnn:
        return _cnn_v2(self._compute_dtype)

    def init_estimate(self) -> LandmarkResultV2:
        return LandmarkResultV2()

    def extract(self, outputs, estimate: LandmarkResultV2) -> None:
        estimate.face_flag = float(sigmoid(outputs[1].reshape(())))
        # (sigmoid applied inside the model)
        estimate.tongue_out = float(outputs[2].reshape(()))
        coords = outputs[0].reshape(-1, 3)[: estimate.NUM_LANDMARKS]
        estimate.landmarks.set_positions(coords)

    def decode_device(self, outputs):
        import jax

        coords = outputs[0].reshape(-1, 3)
        conf = jax.nn.sigmoid(outputs[1].reshape(()))
        tongue = outputs[2].reshape(())
        return coords, conf, tongue


def reference_positions() -> np.ndarray:
    """Canonical face mesh reference positions [468,3]
    (3rdparty/3d/canonical_face_model.rs REFERENCE_POSITIONS; parsed from
    the .obj mesh)."""
    from ...assets import fixture_path  # noqa: F401

    from .canonical_face import REFERENCE_POSITIONS

    return REFERENCE_POSITIONS
