"""33-point body pose landmarks (reference: crates/zaru/src/body/landmark.rs).

The networks output 39 landmarks (33 pose + 6 auxiliary), each with
(x, y, z, visibility, presence); visibility/presence pass through sigmoid.
Segmentation / heatmap / world-landmark heads are disabled via output
selection at load (body/landmark.rs:149,175), which lets XLA dead-code
eliminate those branches entirely.
"""

from __future__ import annotations

import enum
from functools import lru_cache

import numpy as np

from ..assets import model_path
from ..landmark import LandmarkNetwork, Landmarks
from ..nn import Cnn, CnnInputShape, ColorMapper, NeuralNetwork
from ..num import sigmoid

__all__ = [
    "LandmarkIdx",
    "LandmarkResult",
    "LiteNetwork",
    "FullNetwork",
    "COARSE_CONNECTIVITY",
]

NUM_POSE = 33
NUM_AUX = 6
NUM_TOTAL = NUM_POSE + NUM_AUX


class LandmarkIdx(enum.IntEnum):
    """(body/landmark.rs:83-117)"""

    NOSE = 0
    LEFT_EYE_INNER = 1
    LEFT_EYE = 2
    LEFT_EYE_OUTER = 3
    RIGHT_EYE_INNER = 4
    RIGHT_EYE = 5
    RIGHT_EYE_OUTER = 6
    LEFT_EAR = 7
    RIGHT_EAR = 8
    MOUTH_LEFT = 9
    MOUTH_RIGHT = 10
    LEFT_SHOULDER = 11
    RIGHT_SHOULDER = 12
    LEFT_ELBOW = 13
    RIGHT_ELBOW = 14
    LEFT_WRIST = 15
    RIGHT_WRIST = 16
    LEFT_PINKY = 17
    RIGHT_PINKY = 18
    LEFT_INDEX = 19
    RIGHT_INDEX = 20
    LEFT_THUMB = 21
    RIGHT_THUMB = 22
    LEFT_HIP = 23
    RIGHT_HIP = 24
    LEFT_KNEE = 25
    RIGHT_KNEE = 26
    LEFT_ANKLE = 27
    RIGHT_ANKLE = 28
    LEFT_HEEL = 29
    RIGHT_HEEL = 30
    LEFT_FOOT_INDEX = 31
    RIGHT_FOOT_INDEX = 32


_I = LandmarkIdx
COARSE_CONNECTIVITY = [
    (_I.LEFT_SHOULDER, _I.RIGHT_SHOULDER),
    (_I.LEFT_SHOULDER, _I.LEFT_ELBOW),
    (_I.LEFT_ELBOW, _I.LEFT_WRIST),
    (_I.RIGHT_SHOULDER, _I.RIGHT_ELBOW),
    (_I.RIGHT_ELBOW, _I.RIGHT_WRIST),
    (_I.LEFT_SHOULDER, _I.LEFT_HIP),
    (_I.LEFT_HIP, _I.LEFT_ANKLE),
    (_I.LEFT_ANKLE, _I.LEFT_HEEL),
    (_I.LEFT_ANKLE, _I.LEFT_FOOT_INDEX),
    (_I.RIGHT_SHOULDER, _I.RIGHT_HIP),
    (_I.RIGHT_HIP, _I.RIGHT_ANKLE),
    (_I.RIGHT_ANKLE, _I.RIGHT_HEEL),
    (_I.RIGHT_ANKLE, _I.RIGHT_FOOT_INDEX),
]


class LandmarkResult:
    """39 landmarks (33 pose + 6 aux) + pose presence
    (body/landmark.rs:20-78)."""

    def __init__(self):
        self.landmarks = Landmarks(NUM_TOTAL)
        self.pose_presence = 0.0

    def landmarks_mut(self) -> Landmarks:
        return self.landmarks

    def confidence(self) -> float:
        return self.pose_presence

    def presence(self) -> float:
        return self.pose_presence

    def pose_landmarks(self) -> np.ndarray:
        return self.landmarks.positions()[:NUM_POSE]

    def aux_landmarks(self) -> np.ndarray:
        return self.landmarks.positions()[NUM_POSE:]

    def get(self, idx: LandmarkIdx):
        return self.landmarks.get(int(idx))


@lru_cache(maxsize=None)
def _load_cnn(filename: str, compute_dtype=None) -> Cnn:
    nn = NeuralNetwork.load(
        model_path(filename), output_subset=[0, 1], compute_dtype=compute_dtype
    )
    return Cnn(nn, CnnInputShape.NCHW, ColorMapper.linear(0.0, 1.0))


class _PoseLandmark(LandmarkNetwork):
    FILE: str

    def __init__(self, compute_dtype=None):
        self._compute_dtype = compute_dtype

    def cnn(self) -> Cnn:
        return _load_cnn(self.FILE, self._compute_dtype)

    def init_estimate(self) -> LandmarkResult:
        return LandmarkResult()

    def extract(self, outputs, estimate: LandmarkResult) -> None:
        """(body/landmark.rs:193-227)."""
        screen = outputs[0].reshape(NUM_TOTAL, 5)
        estimate.pose_presence = float(outputs[1].reshape(()))
        pos = screen[:, 0:3].astype(np.float32)
        estimate.landmarks.set_positions(pos)
        estimate.landmarks.set_visibility(sigmoid(screen[:, 3]))
        estimate.landmarks.set_presence(sigmoid(screen[:, 4]))

    def decode_device(self, outputs):
        """Traced decode for fused pipelines: (coords [39,3], pose flag,
        visibility [39], presence [39]) — same semantics as extract()."""
        import jax

        screen = outputs[0].reshape(NUM_TOTAL, 5)
        flag = outputs[1].reshape(())
        return (
            screen[:, 0:3],
            flag,
            jax.nn.sigmoid(screen[:, 3]),
            jax.nn.sigmoid(screen[:, 4]),
        )


class LiteNetwork(_PoseLandmark):
    """pose_landmark_lite.onnx — blob missing from the reference checkout;
    raises ModelMissingError at load (body/landmark.rs:138-160)."""

    FILE = "pose_landmark_lite.onnx"


class FullNetwork(_PoseLandmark):
    """pose_landmark_full.onnx — blob missing from the reference checkout
    (body/landmark.rs:164-186)."""

    FILE = "pose_landmark_full.onnx"
