"""68-point facial landmarks following the Multi-PIE scheme
(reference: crates/zaru/src/face/landmark/multipie68.rs)."""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ...assets import model_path
from ...landmark import LandmarkNetwork, Landmarks
from ...nn import Cnn, CnnInputShape, ColorMapper, NeuralNetwork

__all__ = ["LandmarkResult", "PeppaFacialLandmark", "FaceOnnx", "reference_positions"]

NUM_LANDMARKS = 68


class LandmarkResult:
    """68 2-D landmarks (multipie68.rs:24-44). No confidence output."""

    def __init__(self):
        self.landmarks = Landmarks(NUM_LANDMARKS)

    def landmarks_mut(self) -> Landmarks:
        return self.landmarks


class _Pfld68(LandmarkNetwork):
    FILE: str
    COLOR_RANGE = (-1.0, 1.0)

    def cnn(self) -> Cnn:
        return _load_cnn(self.FILE, self.COLOR_RANGE)

    def init_estimate(self) -> LandmarkResult:
        return LandmarkResult()

    def extract(self, outputs, estimate: LandmarkResult) -> None:
        """Outputs are normalized x,y pairs scaled by input resolution
        (multipie68.rs:68-76, 105-113)."""
        res = self.cnn().input_resolution()
        xy = outputs[0].reshape(-1)[: NUM_LANDMARKS * 2].reshape(NUM_LANDMARKS, 2)
        pos = np.zeros((NUM_LANDMARKS, 3), np.float32)
        pos[:, 0] = xy[:, 0] * res.width
        pos[:, 1] = xy[:, 1] * res.height
        estimate.landmarks.set_positions(pos)


@lru_cache(maxsize=None)
def _load_cnn(filename: str, color_range) -> Cnn:
    return Cnn(
        NeuralNetwork.load(model_path(filename)),
        CnnInputShape.NCHW,
        ColorMapper.linear(*color_range),
    )


class PeppaFacialLandmark(_Pfld68):
    """Peppa-Facial-Landmark-PyTorch slim-160 network: fast, less accurate
    (multipie68.rs:50-77)."""

    FILE = "slim_160_latest.onnx"
    COLOR_RANGE = (-1.0, 1.0)


class FaceOnnx(_Pfld68):
    """FaceONNX 68-point landmarker: ~2× slower, more accurate
    (multipie68.rs:79-114)."""

    FILE = "landmarks_68_pfld.onnx"
    COLOR_RANGE = (0.0, 1.0)


def reference_positions() -> np.ndarray:
    """[68,3] reference landmark positions (3rdparty/3d/multipie68.rs)."""
    from .canonical_face import MULTIPIE68_POSITIONS

    return MULTIPIE68_POSITIONS
