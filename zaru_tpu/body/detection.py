"""Human body/pose detection (reference: crates/zaru/src/body/detection.rs)."""

from __future__ import annotations

import enum
from functools import lru_cache

import jax.numpy as jnp

from ..assets import model_path
from ..detection import (
    Anchors,
    DetectionNetwork,
    Detections,
    LayerInfo,
    decode_ssd,
    decode_ssd_device,
)
from ..nn import Cnn, CnnInputShape, ColorMapper, NeuralNetwork

__all__ = ["Keypoint", "PoseNetwork"]


class Keypoint(enum.IntEnum):
    """Keypoints of the pose detector (body/detection.rs:121-127).

    Only HIPS is named by the reference; index 1 is the MediaPipe
    full-body scale/rotation alignment point above the head, used here to
    seed the landmark ROI.
    """

    HIPS = 0
    SCALE_POINT = 1


@lru_cache(maxsize=None)
def _cnn(compute_dtype=None) -> Cnn:
    return Cnn(
        NeuralNetwork.load(
            model_path("pose_detection.onnx"), compute_dtype=compute_dtype
        ),
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

    def __init__(self, compute_dtype=None):
        self._anchors = Anchors.calculate(self.LAYERS)
        self._compute_dtype = compute_dtype

    def cnn(self) -> Cnn:
        return _cnn(self._compute_dtype)

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

    def decode_device(self, outputs, thresh: float = 0.5):
        """Traced decode for fused pipelines. The rotation is the clockwise
        angle aligning the hips→scale-point vector with +Y (Y-up), matching
        the hand/face convention (MediaPipe pose alignment points)."""
        res = self.cnn().input_resolution()
        boxes, conf, kps = decode_ssd_device(
            res.width,
            res.height,
            jnp.asarray(self._anchors.centers),
            outputs[0],
            outputs[1],
            thresh,
            self.NUM_KEYPOINTS,
        )
        rel = kps[:, Keypoint.HIPS] - kps[:, Keypoint.SCALE_POINT]
        angles = jnp.arctan2(-rel[..., 0], rel[..., 1])
        return boxes, conf, kps, angles
