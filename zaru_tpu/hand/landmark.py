"""21-point hand landmark estimation
(reference: crates/zaru/src/hand/landmark.rs)."""

from __future__ import annotations

import enum
from functools import lru_cache

import numpy as np

from ..assets import model_path
from ..landmark import LandmarkNetwork, Landmarks
from ..nn import Cnn, CnnInputShape, ColorMapper, NeuralNetwork

__all__ = [
    "Handedness",
    "LandmarkIdx",
    "LandmarkResult",
    "LiteNetwork",
    "FullNetwork",
    "PALM_LANDMARKS",
    "CONNECTIVITY",
]


class Handedness(enum.Enum):
    LEFT = "left"
    RIGHT = "right"


class LandmarkIdx(enum.IntEnum):
    """(hand/landmark.rs:175-197)"""

    WRIST = 0
    THUMB_CMC = 1
    THUMB_MCP = 2
    THUMB_IP = 3
    THUMB_TIP = 4
    INDEX_FINGER_MCP = 5
    INDEX_FINGER_PIP = 6
    INDEX_FINGER_DIP = 7
    INDEX_FINGER_TIP = 8
    MIDDLE_FINGER_MCP = 9
    MIDDLE_FINGER_PIP = 10
    MIDDLE_FINGER_DIP = 11
    MIDDLE_FINGER_TIP = 12
    RING_FINGER_MCP = 13
    RING_FINGER_PIP = 14
    RING_FINGER_DIP = 15
    RING_FINGER_TIP = 16
    PINKY_MCP = 17
    PINKY_PIP = 18
    PINKY_DIP = 19
    PINKY_TIP = 20


PALM_LANDMARKS = [
    LandmarkIdx.WRIST,
    LandmarkIdx.THUMB_CMC,
    LandmarkIdx.INDEX_FINGER_MCP,
    LandmarkIdx.MIDDLE_FINGER_MCP,
    LandmarkIdx.RING_FINGER_MCP,
    LandmarkIdx.PINKY_MCP,
]

_I = LandmarkIdx
CONNECTIVITY = [
    # Palm outline:
    (_I.WRIST, _I.THUMB_CMC),
    (_I.THUMB_CMC, _I.INDEX_FINGER_MCP),
    (_I.INDEX_FINGER_MCP, _I.MIDDLE_FINGER_MCP),
    (_I.MIDDLE_FINGER_MCP, _I.RING_FINGER_MCP),
    (_I.RING_FINGER_MCP, _I.PINKY_MCP),
    (_I.PINKY_MCP, _I.WRIST),
    # Fingers:
    (_I.THUMB_CMC, _I.THUMB_MCP),
    (_I.THUMB_MCP, _I.THUMB_IP),
    (_I.THUMB_IP, _I.THUMB_TIP),
    (_I.INDEX_FINGER_MCP, _I.INDEX_FINGER_PIP),
    (_I.INDEX_FINGER_PIP, _I.INDEX_FINGER_DIP),
    (_I.INDEX_FINGER_DIP, _I.INDEX_FINGER_TIP),
    (_I.MIDDLE_FINGER_MCP, _I.MIDDLE_FINGER_PIP),
    (_I.MIDDLE_FINGER_PIP, _I.MIDDLE_FINGER_DIP),
    (_I.MIDDLE_FINGER_DIP, _I.MIDDLE_FINGER_TIP),
    (_I.RING_FINGER_MCP, _I.RING_FINGER_PIP),
    (_I.RING_FINGER_PIP, _I.RING_FINGER_DIP),
    (_I.RING_FINGER_DIP, _I.RING_FINGER_TIP),
    (_I.PINKY_MCP, _I.PINKY_PIP),
    (_I.PINKY_PIP, _I.PINKY_DIP),
    (_I.PINKY_DIP, _I.PINKY_TIP),
]


class LandmarkResult:
    """21 3-D landmarks + presence + handedness (hand/landmark.rs:17-167)."""

    NUM_LANDMARKS = 21

    def __init__(self):
        self.landmarks = Landmarks(self.NUM_LANDMARKS)
        self.presence = 0.0
        self.raw_handedness = 0.0

    def landmarks_mut(self) -> Landmarks:
        return self.landmarks

    def confidence(self) -> float:
        """Presence flag (sigmoid applied in-model), used by the tracker."""
        return self.presence

    def landmark_position(self, index: int) -> np.ndarray:
        return self.landmarks.positions()[index]

    def palm_landmarks(self) -> np.ndarray:
        return self.landmarks.positions()[[int(i) for i in PALM_LANDMARKS]]

    def palm_center(self) -> np.ndarray:
        return self.palm_landmarks().mean(axis=0)

    def rotation_radians(self) -> float:
        """Clockwise palm rotation vs. fingers-up (hand/landmark.rs:65-78)."""
        finger = self.landmark_position(LandmarkIdx.MIDDLE_FINGER_MCP)[:2]
        wrist = self.landmark_position(LandmarkIdx.WRIST)[:2]
        rel = wrist - finger
        return float(np.arctan2(-rel[0], rel[1]))

    def angle_radians(self) -> float:
        return self.rotation_radians()

    def handedness(self) -> Handedness:
        return Handedness.RIGHT if self.raw_handedness > 0.5 else Handedness.LEFT


@lru_cache(maxsize=None)
def _load_cnn(filename: str, compute_dtype=None) -> Cnn:
    return Cnn(
        NeuralNetwork.load(model_path(filename), compute_dtype=compute_dtype),
        CnnInputShape.NCHW,
        ColorMapper.linear(0.0, 1.0),
    )


class _HandLandmark(LandmarkNetwork):
    FILE: str

    def __init__(self, compute_dtype=None):
        """``compute_dtype=jnp.bfloat16`` runs the network body in bf16
        (~25-35% faster per model on TPU). CAUTION: measured coordinate
        deviation vs f32 reached ~21 px (image scale) on out-of-
        distribution crops — well beyond the 1 px parity budget. Keep f32
        (the default) unless you validate on your own data."""
        self._compute_dtype = compute_dtype

    def cnn(self) -> Cnn:
        return _load_cnn(self.FILE, self._compute_dtype)

    def init_estimate(self) -> LandmarkResult:
        return LandmarkResult()

    def extract(self, outputs, estimate: LandmarkResult) -> None:
        """(hand/landmark.rs:299-321): outputs = screen landmarks [1,63],
        presence [1,1], handedness [1,1], metric landmarks [1,63]."""
        estimate.presence = float(outputs[1].reshape(()))
        estimate.raw_handedness = float(outputs[2].reshape(()))
        coords = outputs[0].reshape(21, 3)
        estimate.landmarks.set_positions(coords)

    def decode_device(self, outputs):
        """Traced decode → (positions [21,3], presence, handedness)."""
        coords = outputs[0].reshape(21, 3)
        presence = outputs[1].reshape(())
        handedness = outputs[2].reshape(())
        return coords, presence, handedness


class LiteNetwork(_HandLandmark):
    """Light hand landmarker (>20ms/inference on the reference's CPU,
    hand/landmark.rs:246-247). Input 224×224."""

    FILE = "hand_landmark_lite.onnx"


class FullNetwork(_HandLandmark):
    """More accurate, +25-30% inference time (hand/landmark.rs:272-273).
    Model blob missing from the reference checkout; raises
    ModelMissingError at load."""

    FILE = "hand_landmark_full.onnx"
