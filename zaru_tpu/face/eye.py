"""Eye & iris landmark estimation (reference: crates/zaru/src/face/eye.rs).

The MediaPipe iris network computes 71 eye-contour + 5 iris landmarks of a
*left* eye crop (64×64); right eyes are processed by flipping the input
horizontally and un-flipping the outputs (eye.rs:82,121,
`flip_horizontal_in_place`).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..assets import model_path
from ..landmark import LandmarkNetwork, Landmarks
from ..nn import Cnn, CnnInputShape, ColorMapper, NeuralNetwork
from ..resolution import Resolution

__all__ = ["EyeNetwork", "EyeLandmarks"]


class EyeLandmarks:
    """76 landmarks: 5 iris (index 0 = center) then 71 eye contour
    (eye.rs:70-140)."""

    NUM_LANDMARKS = 76

    def __init__(self):
        self.landmarks = Landmarks(self.NUM_LANDMARKS)

    def landmarks_mut(self) -> Landmarks:
        return self.landmarks

    def iris_center(self) -> np.ndarray:
        return self.landmarks.positions()[0]

    def iris_contour(self) -> np.ndarray:
        """[4,3] outer iris landmarks."""
        return self.landmarks.positions()[1:5]

    def iris_diameter(self) -> float:
        """Average iris diameter from the contour (eye.rs:110-121)."""
        center = self.iris_center()
        radii = np.linalg.norm(self.iris_contour() - center, axis=-1)
        return float(radii.mean() * 2.0)

    def eye_contour(self) -> np.ndarray:
        """[71,3] eye contour + brows."""
        return self.landmarks.positions()[5:]

    def flip_horizontal_in_place(self, full_res: Resolution) -> None:
        """Flips all landmarks along X (eye.rs:128-134); used to undo the
        input flip applied for right eyes."""
        half = np.float32(full_res.width) / 2.0
        pos = self.landmarks.positions().copy()
        pos[:, 0] = -(pos[:, 0] - half) + half
        self.landmarks.set_positions(pos)


@lru_cache(maxsize=None)
def _cnn() -> Cnn:
    return Cnn(
        NeuralNetwork.load(model_path("iris_landmark.onnx")),
        CnnInputShape.NCHW,
        ColorMapper.linear(-1.0, 1.0),
    )


class EyeNetwork(LandmarkNetwork):
    """MediaPipe iris network (64×64 → eye 1×213 = 71×3, iris 1×15 = 5×3)
    (eye.rs:29-66)."""

    def cnn(self) -> Cnn:
        return _cnn()

    def init_estimate(self) -> EyeLandmarks:
        return EyeLandmarks()

    def extract(self, outputs, estimate: EyeLandmarks) -> None:
        eye = outputs[0].reshape(-1, 3)  # 71 contour points
        iris = outputs[1].reshape(-1, 3)  # 5 iris points
        pos = np.concatenate([iris, eye], axis=0).astype(np.float32)
        estimate.landmarks.set_positions(pos)
