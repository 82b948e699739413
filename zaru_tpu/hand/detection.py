"""Palm detection (reference: crates/zaru/src/hand/detection.rs).

MediaPipe palm-detection networks. Detection angle orients the hand so
fingers point up (wrist→middle-finger-MCP vector vs. the Y axis).
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
from ..nn import Cnn, CnnInputShape, ColorMapper, NeuralNetwork

__all__ = ["Keypoint", "ALL_KEYPOINTS", "LiteNetwork", "FullNetwork"]


class Keypoint(enum.IntEnum):
    """Palm detection keypoint indices (hand/detection.rs:13-31)."""

    WRIST = 0
    INDEX_FINGER_MCP = 1
    MIDDLE_FINGER_MCP = 2
    RING_FINGER_MCP = 3
    PINKY_MCP = 4
    THUMB_CMC = 5
    THUMB_MCP = 6


ALL_KEYPOINTS = list(Keypoint)


def _signed_angle_to_y(v) -> float:
    """Clockwise rotation aligning ``v`` with +Y, Y-up convention
    (zaru-linalg vector.rs:542-574): ``atan2(-v.x, v.y)``."""
    return float(np.arctan2(-v[0], v[1]))


def _palm_angle(det) -> float:
    """(hand/detection.rs:173-177): rotation of wrist→middle-MCP vs. Y."""
    rel = det.keypoint(Keypoint.WRIST) - det.keypoint(Keypoint.MIDDLE_FINGER_MCP)
    return _signed_angle_to_y(rel)


@lru_cache(maxsize=None)
def _load_cnn(filename: str, compute_dtype=None) -> Cnn:
    return Cnn(
        NeuralNetwork.load(model_path(filename), compute_dtype=compute_dtype),
        CnnInputShape.NCHW,
        ColorMapper.linear(0.0, 1.0),
    )


class _Palm(DetectionNetwork):
    FILE: str
    # Both palm networks share the anchor layout (hand/detection.rs:115-120).
    LAYERS = [LayerInfo(2, 24, 24), LayerInfo(6, 12, 12)]
    NUM_KEYPOINTS = 7

    def __init__(self, compute_dtype=None):
        self._anchors = Anchors.calculate(self.LAYERS)
        self._compute_dtype = compute_dtype

    def cnn(self) -> Cnn:
        return _load_cnn(self.FILE, self._compute_dtype)

    @property
    def anchors(self) -> Anchors:
        return self._anchors

    def extract(self, outputs, threshold: float, detections: Detections) -> None:
        res = self.cnn().input_resolution()
        n = self._anchors.anchor_count()
        assert outputs[0].shape == (1, n, 18), outputs[0].shape
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
            angle_fn=_palm_angle,
        )

    def decode_device(self, outputs, thresh: float = 0.5):
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
        rel = kps[:, Keypoint.WRIST] - kps[:, Keypoint.MIDDLE_FINGER_MCP]
        angles = jnp.arctan2(-rel[..., 0], rel[..., 1])
        return boxes, conf, kps, angles


class LiteNetwork(_Palm):
    """"Lightweight" palm detector — still ~10× the cost of short-range face
    detection on the reference's CPU (hand/detection.rs:44-48). Input
    192×192, 2016 anchors."""

    FILE = "palm_detection_lite.onnx"


class FullNetwork(_Palm):
    """Full palm detector, ~15% slower than lite (hand/detection.rs:77-79).

    The model blob is missing from the reference checkout
    (.MISSING_LARGE_BLOBS); loading raises ModelMissingError until the blob
    is provided.
    """

    FILE = "palm_detection_full.onnx"
