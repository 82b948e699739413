"""Non-Maximum Suppression and Averaging.

Two implementations of the reference's NMS (crates/zaru/src/detection/nms.rs):

- :class:`NonMaxSuppression`: the exact host algorithm (sort by confidence,
  pop seeds from the top, remove or confidence-weight-average overlapping
  detections) operating on :class:`~zaru_tpu.detection.Detection` lists —
  used by the host `Detector` API and as the parity oracle.

- :func:`nms_average_device` / :func:`nms_remove_device`: fixed-shape,
  traceable reformulations for the fused on-device cascade. Data-dependent
  "pop highest and retain non-overlapping" becomes a ``lax.scan`` over a
  static number of output slots with masked confidence-weighted reductions —
  identical results for up to ``max_out`` objects, with no host round-trip.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..geometry import rect_iou
from ..num import total_f32_key

__all__ = ["SuppressionMode", "NonMaxSuppression", "nms_average_device", "nms_remove_device"]

DEFAULT_IOU_THRESH = 0.3


class SuppressionMode:
    """How overlapping detections are handled (nms.rs:157-166)."""

    Remove = "remove"
    Average = "average"


class NonMaxSuppression:
    """Host NMS, exact reference semantics (nms.rs:19-152)."""

    def __init__(self):
        self.iou_thresh = DEFAULT_IOU_THRESH
        self.mode = SuppressionMode.Average

    def set_iou_thresh(self, iou_thresh: float) -> None:
        self.iou_thresh = iou_thresh

    def set_mode(self, mode: str) -> None:
        self.mode = mode

    def process(self, detections: list) -> list:
        from . import Detection  # cycle-free at call time

        out = []
        # Sort ascending by confidence (TotalF32 order), pop from the back.
        pending = sorted(detections, key=lambda d: total_f32_key(d.confidence()))
        while pending:
            seed = pending.pop()
            seed_rect = seed.bounding_rect()
            overlapping = [seed]
            kept = []
            for other in pending:
                if seed_rect.iou(other.bounding_rect()) >= self.iou_thresh:
                    overlapping.append(other)
                else:
                    kept.append(other)
            pending = kept

            if self.mode == SuppressionMode.Remove:
                out.append(seed)
                continue

            # Confidence-weighted average of box, keypoints, angle
            # (nms.rs:91-139). Output confidence is the seed's.
            divisor = np.float32(0.0)
            acc_rect = np.zeros(4, np.float32)
            acc_angle = np.float32(0.0)
            nkp = max((len(d.keypoints()) for d in overlapping), default=0)
            acc_kp = np.zeros((nkp, 2), np.float32)
            for det in overlapping:
                kps = det.keypoints()
                assert len(kps) in (0, nkp), "landmark count must be constant"
                factor = np.float32(det.confidence())
                divisor += factor
                r = det.bounding_rect()
                acc_rect += np.concatenate([r.center(), [r.width(), r.height()]]) * factor
                acc_angle += np.float32(det.angle()) * factor
                for i, kp in enumerate(kps):
                    acc_kp[i] += kp * factor
            acc_rect /= divisor
            acc_kp /= divisor
            acc_angle /= divisor

            from ..geometry import Rect

            avg = Detection(
                confidence=seed.confidence(),
                rect=Rect.from_center(*acc_rect),
                keypoints=[acc_kp[i] for i in range(nkp)],
                angle=float(acc_angle),
            )
            out.append(avg)
        return out


def nms_average_device(
    boxes, conf, keypoints, angles, iou_thresh: float = DEFAULT_IOU_THRESH, max_out: int = 16
):
    """Fixed-shape confidence-weighted NMS (SuppressionMode::Average).

    Args (all traced, ``N`` anchors): ``boxes [N,4]`` (cx,cy,w,h),
    ``conf [N]`` — 0 for below-threshold anchors, ``keypoints [N,K,2]``,
    ``angles [N]``.

    Returns ``(valid [max_out] bool, conf [max_out], boxes [max_out,4],
    keypoints [max_out,K,2], angles [max_out])`` — slots in descending seed
    confidence, invalid slots zeroed.
    """

    def step(remaining, _):
        seed = jnp.argmax(remaining)
        seed_conf = remaining[seed]
        valid = seed_conf > 0.0

        iou = rect_iou(boxes[seed], boxes)
        over = (iou >= iou_thresh) & (remaining > 0.0)
        w = jnp.where(over, conf, 0.0)
        divisor = jnp.maximum(jnp.sum(w), 1e-20)
        avg_box = jnp.sum(w[:, None] * boxes, axis=0) / divisor
        avg_kp = jnp.sum(w[:, None, None] * keypoints, axis=0) / divisor
        avg_angle = jnp.sum(w * angles) / divisor

        remaining = jnp.where(over, 0.0, remaining)
        z = jnp.where(valid, 1.0, 0.0)
        return remaining, (
            valid,
            seed_conf * z,
            avg_box * z,
            avg_kp * z,
            avg_angle * z,
        )

    _, outs = lax.scan(step, conf, None, length=max_out)
    return outs


def nms_remove_device(
    boxes, conf, keypoints, angles, iou_thresh: float = DEFAULT_IOU_THRESH, max_out: int = 16
):
    """Fixed-shape classic NMS (SuppressionMode::Remove)."""

    def step(remaining, _):
        seed = jnp.argmax(remaining)
        seed_conf = remaining[seed]
        valid = seed_conf > 0.0
        iou = rect_iou(boxes[seed], boxes)
        over = (iou >= iou_thresh) & (remaining > 0.0)
        remaining = jnp.where(over, 0.0, remaining)
        z = jnp.where(valid, 1.0, 0.0)
        return remaining, (
            valid,
            seed_conf * z,
            boxes[seed] * z,
            keypoints[seed] * z,
            angles[seed] * z,
        )

    _, outs = lax.scan(step, conf, None, length=max_out)
    return outs
