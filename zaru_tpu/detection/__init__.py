"""Object detection engine.

TPU-native counterpart of reference crates/zaru/src/detection.rs. The host
`Detector` mirrors the reference's generic drive loop (detection.rs:216-270):
aspect-fit view → fused sample+infer (one jitted XLA program) → extract →
NMS → coordinate un-mapping. The SSD decode is also available as a pure
traced function (:func:`decode_ssd_device`) so fused pipelines can keep
detection entirely on device.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry import Rect, signed_angle_to_x
from ..nn import Cnn
from ..image import as_view
from ..num import sigmoid
from ..timer import Timer
from .nms import NonMaxSuppression, SuppressionMode, nms_average_device, nms_remove_device
from .ssd import Anchors, LayerInfo

__all__ = [
    "Detection",
    "Detections",
    "Detector",
    "DetectionNetwork",
    "Anchors",
    "LayerInfo",
    "NonMaxSuppression",
    "SuppressionMode",
    "decode_ssd",
    "decode_ssd_device",
    "nms_average_device",
    "nms_remove_device",
]


class Detection:
    """A detected object: confidence, optional clockwise angle, bounding
    rect, keypoints (reference detection.rs:288-428)."""

    def __init__(self, confidence: float, rect: Rect, keypoints=None, angle: float = 0.0):
        self._confidence = float(confidence)
        self._rect = rect
        self._keypoints = [np.asarray(k, np.float32) for k in (keypoints or [])]
        self._angle = float(angle)

    def confidence(self) -> float:
        return self._confidence

    def set_confidence(self, c: float) -> None:
        self._confidence = float(c)

    def angle(self) -> float:
        """Clockwise angle in radians; 0.0 if the network does not estimate
        it (detection.rs:327-337)."""
        return self._angle

    def set_angle(self, a: float) -> None:
        self._angle = float(a)

    def bounding_rect(self) -> Rect:
        return self._rect

    def set_bounding_rect(self, rect: Rect) -> None:
        self._rect = rect

    def keypoints(self) -> list:
        return self._keypoints

    def keypoint(self, i: int) -> np.ndarray:
        return self._keypoints[i]

    def push_keypoint(self, kp) -> None:
        self._keypoints.append(np.asarray(kp, np.float32))

    def __repr__(self):
        return (
            f"Detection(conf={self._confidence:.3f}, rect={self._rect!r}, "
            f"angle={np.degrees(self._angle):.1f}deg, {len(self._keypoints)} kps)"
        )


class Detections:
    """Per-class detection collection (detection.rs:42-124)."""

    def __init__(self):
        self._by_class: dict[int, list[Detection]] = {}

    def __len__(self) -> int:
        return sum(len(v) for v in self._by_class.values())

    def is_empty(self) -> bool:
        return len(self) == 0

    def clear(self) -> None:
        self._by_class.clear()

    def push(self, class_id: int, detection: Detection) -> None:
        self._by_class.setdefault(class_id, []).append(detection)

    def iter(self):
        for dets in self._by_class.values():
            yield from dets

    def __iter__(self):
        return self.iter()

    def all_detections(self):
        for cls, dets in self._by_class.items():
            for d in dets:
                yield cls, d

    def for_class(self, class_id: int):
        return iter(self._by_class.get(class_id, []))

    def classes(self):
        return list(self._by_class)


class DetectionNetwork:
    """Base for detection network wrappers (reference detection.rs:21-40).

    Subclasses provide ``cnn()`` and ``extract(outputs, thresh, detections)``
    with positions in *network input* coordinates; optionally a
    ``decode_device(outputs)`` pure function for fused pipelines.
    """

    def cnn(self) -> Cnn:
        raise NotImplementedError

    def extract(self, outputs, threshold: float, detections: Detections) -> None:
        raise NotImplementedError

    def decode_device(self, outputs):
        raise NotImplementedError


DEFAULT_THRESHOLD = 0.5


class Detector:
    """Generic detector driving a :class:`DetectionNetwork`
    (detection.rs:152-280)."""

    def __init__(self, network: DetectionNetwork):
        self._network = network
        self._detections = Detections()
        self._t_infer = Timer("infer")
        self._t_extract = Timer("extract")
        self._t_nms = Timer("nms")
        self._thresh = DEFAULT_THRESHOLD
        self._nms = NonMaxSuppression()

    def input_resolution(self):
        return self._network.cnn().input_resolution()

    def set_threshold(self, thresh: float) -> None:
        self._thresh = thresh

    @property
    def nms(self) -> NonMaxSuppression:
        return self._nms

    def detect(self, image) -> Detections:
        """Detects objects; coordinates are in input-image space
        (detection.rs:206-270)."""
        view = as_view(image)
        self._detections.clear()

        cnn = self._network.cnn()
        input_res = cnn.input_resolution()
        rect = view.rect().grow_to_fit_aspect(input_res.aspect_ratio())
        fit_view = view.view(rect)

        with self._t_infer.measure():
            # Real completion fence: np.asarray readback inside the
            # infer span (block_until_ready is not a fence through
            # tunneled devices, CLAUDE.md).
            outputs = [np.asarray(o) for o in cnn.estimate(fit_view)]

        with self._t_extract.measure():
            self._network.extract(outputs, self._thresh, self._detections)

        with self._t_nms.measure():
            for cls in self._detections.classes():
                self._detections._by_class[cls] = self._nms.process(
                    self._detections._by_class[cls]
                )

        # Map detections back to the input image's coordinate system.
        scale = np.float32(rect.width()) / np.float32(input_res.width)
        off = rect.top_left()
        for _, det in self._detections.all_detections():
            r = det.bounding_rect()
            det.set_bounding_rect(
                Rect.from_center(
                    r.center()[0] * scale, r.center()[1] * scale,
                    r.width() * scale, r.height() * scale,
                ).move_by(off)
            )
            det._keypoints = [kp * scale + off for kp in det._keypoints]
        return self._detections

    def timers(self):
        return [self._t_infer, self._t_extract, self._t_nms]


# --------------------------------------------------------------------------
# Generic SSD output decoding (shared by BlazeFace-family wrappers)
# --------------------------------------------------------------------------


def decode_ssd(
    input_w: int,
    input_h: int,
    anchors: Anchors,
    boxes_raw: np.ndarray,
    conf_raw: np.ndarray,
    thresh: float,
    detections: Detections,
    num_keypoints: int,
    angle_fn: Callable | None = None,
    class_id: int = 0,
) -> None:
    """Host SSD extraction (reference face/detection.rs:96-157,
    hand/detection.rs:108-180, vectorized).

    ``boxes_raw [1,N,D]``: per-anchor (dx, dy, w, h, kp0x, kp0y, ...) in
    input pixels, offset by the anchor center; ``conf_raw [1,N,1]`` raw
    logits.

    Note: keypoints are decoded as ``raw + anchor·input_size`` (the MediaPipe
    convention). The reference adds ``center·input_size`` instead
    (face/detection.rs:137), which double-scales — a reference bug that
    cancels in its angle computation; we keep keypoints correct and the
    derived angles identical.
    """
    n = anchors.anchor_count()
    assert boxes_raw.shape[:2] == (1, n), boxes_raw.shape
    conf = sigmoid(conf_raw.reshape(n).astype(np.float32))
    idxs = np.nonzero(conf >= thresh)[0]
    size = np.array([input_w, input_h], np.float32)
    for i in idxs:
        bp = boxes_raw[0, i]
        anchor_px = anchors.centers[i] * size
        center = bp[0:2] + anchor_px
        det = Detection(
            float(conf[i]),
            Rect.from_center(center[0], center[1], bp[2], bp[3]),
            keypoints=[
                bp[4 + 2 * k : 6 + 2 * k] + anchor_px for k in range(num_keypoints)
            ],
        )
        if angle_fn is not None:
            det.set_angle(angle_fn(det))
        detections.push(class_id, det)


def decode_ssd_device(
    input_w: int,
    input_h: int,
    anchor_centers,
    boxes_raw,
    conf_raw,
    thresh: float,
    num_keypoints: int,
):
    """Traced SSD decode for fused pipelines.

    Returns ``(boxes [N,4] cxcywh, conf [N] — zeroed below thresh,
    keypoints [N,K,2])``, all in network-input pixel coordinates.
    """
    n = anchor_centers.shape[0]
    conf = jax.nn.sigmoid(conf_raw.reshape(n))
    conf = jnp.where(conf >= thresh, conf, 0.0)
    size = jnp.asarray([input_w, input_h], jnp.float32)
    anchor_px = anchor_centers * size  # [N,2]
    bp = boxes_raw.reshape(n, -1)
    center = bp[:, 0:2] + anchor_px
    boxes = jnp.concatenate([center, bp[:, 2:4]], axis=-1)
    kps = bp[:, 4 : 4 + 2 * num_keypoints].reshape(n, num_keypoints, 2) + anchor_px[
        :, None, :
    ]
    return boxes, conf, kps
