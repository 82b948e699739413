"""BlazeFace face detection (reference: crates/zaru/src/face/detection.rs).

Wraps MediaPipe's short-range and full-range BlazeFace networks. The model
body runs as one XLA program; anchor decode + angle derivation are shared
with the generic SSD helpers.
"""

from __future__ import annotations

import enum
from functools import lru_cache

import numpy as np

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
from ..geometry import signed_angle_to_x
from ..nn import Cnn, CnnInputShape, ColorMapper, NeuralNetwork

__all__ = ["Keypoint", "ShortRangeNetwork", "FullRangeNetwork"]


class Keypoint(enum.IntEnum):
    """Keypoint indices of the BlazeFace detections
    (face/detection.rs:24-27)."""

    LEFT_EYE = 0
    RIGHT_EYE = 1
    NOSE_TIP = 2
    MOUTH = 3
    LEFT_EAR = 4
    RIGHT_EAR = 5


def _face_angle(det) -> float:
    """Clockwise rotation from the left→right eye vector
    (face/detection.rs:149-155): `ltr.signed_angle_to(X)` = atan2(y, x) in
    image (y-down) coordinates."""
    ltr = det.keypoint(Keypoint.RIGHT_EYE) - det.keypoint(Keypoint.LEFT_EYE)
    return float(signed_angle_to_x(ltr))


@lru_cache(maxsize=None)
def _load_cnn(filename: str, compute_dtype=None) -> Cnn:
    return Cnn(
        NeuralNetwork.load(model_path(filename), compute_dtype=compute_dtype),
        CnnInputShape.NCHW,
        ColorMapper.linear(-1.0, 1.0),
    )


class _BlazeFace(DetectionNetwork):
    FILE: str
    LAYERS: list[LayerInfo]
    NUM_KEYPOINTS = 6

    def __init__(self, compute_dtype=None):
        self._anchors = Anchors.calculate(self.LAYERS)
        self._compute_dtype = compute_dtype

    def cnn(self) -> Cnn:
        return _load_cnn(self.FILE, self._compute_dtype)

    @property
    def anchors(self) -> Anchors:
        return self._anchors

    def extract(self, outputs, threshold: float, detections: Detections) -> None:
        """(face/detection.rs:96-157). outputs[0]: boxes [1,N,16];
        outputs[1]: confidences [1,N,1]."""
        res = self.cnn().input_resolution()
        n = self._anchors.anchor_count()
        assert outputs[0].shape == (1, n, 16), outputs[0].shape
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
            angle_fn=_face_angle,
        )

    def decode_device(self, outputs, thresh: float = 0.5):
        """Traced decode → (boxes, conf, keypoints, angles), input coords."""
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
        ltr = kps[:, Keypoint.RIGHT_EYE] - kps[:, Keypoint.LEFT_EYE]
        angles = signed_angle_to_x(ltr)
        return boxes, conf, kps, angles


class ShortRangeNetwork(_BlazeFace):
    """Small and fast; best for faces within ~3m of the camera
    (face/detection.rs:29-60). Input 128×128, 896 anchors."""

    FILE = "face_detection_short_range.onnx"
    LAYERS = [LayerInfo(2, 16, 16), LayerInfo(6, 8, 8)]


class FullRangeNetwork(_BlazeFace):
    """Bigger detection range, ~5× slower on CPU in the reference
    (face/detection.rs:61-94). Input 192×192, 2304 anchors."""

    FILE = "face_detection_full_range.onnx"
    LAYERS = [LayerInfo(1, 48, 48)]
