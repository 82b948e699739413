"""Human body/pose detection (reference: crates/zaru/src/body/detection.rs)."""

from __future__ import annotations

import enum
from functools import lru_cache

from ..assets import model_path
from ..detection import (
    Anchors,
    DetectionNetwork,
    Detections,
    LayerInfo,
    decode_ssd,
)
from ..nn import Cnn, CnnInputShape, ColorMapper, NeuralNetwork

__all__ = ["Keypoint", "PoseNetwork"]


class Keypoint(enum.IntEnum):
    """Keypoints of the pose detector (body/detection.rs:121-127)."""

    HIPS = 0


@lru_cache(maxsize=None)
def _cnn() -> Cnn:
    return Cnn(
        NeuralNetwork.load(model_path("pose_detection.onnx")),
        CnnInputShape.NCHW,
        ColorMapper.linear(-1.0, 1.0),
    )


class PoseNetwork(DetectionNetwork):
    """Pose detection network (body/detection.rs:27-66). Input 224×224;
    anchors (2,28,28)+(2,14,14)+(6,7,7); 12 box params = box + 4 keypoints
    (hips at index 0). Model blob missing from the reference checkout —
    raises ModelMissingError at load until provided."""

    LAYERS = [LayerInfo(2, 28, 28), LayerInfo(2, 14, 14), LayerInfo(6, 7, 7)]
    NUM_KEYPOINTS = 4

    def __init__(self):
        self._anchors = Anchors.calculate(self.LAYERS)

    def cnn(self) -> Cnn:
        return _cnn()

    @property
    def anchors(self) -> Anchors:
        return self._anchors

    def extract(self, outputs, threshold: float, detections: Detections) -> None:
        res = self.cnn().input_resolution()
        n = self._anchors.anchor_count()
        assert outputs[0].shape == (1, n, 12), outputs[0].shape
        assert outputs[1].shape == (1, n, 1), outputs[1].shape
        decode_ssd(
            res.width,
            res.height,
            self._anchors,
            outputs[0],
            outputs[1],
            threshold,
            detections,
            num_keypoints=self.NUM_KEYPOINTS,
        )
