"""Fused body-pose tracking cascade.

Pose detection → 33-point landmark tracking as a fixed-slot, single-jit
pipeline (machinery in :mod:`zaru_tpu.pipeline.multi_object`), completing
the reference's body module (reference crates/zaru/src/body/detection.rs,
body/landmark.rs) with the tracking loop the reference only provides for
hands (hand/tracking.rs).

ROI seeding follows the MediaPipe pose convention rather than the plain
detection box: the landmark ROI is a square centered on the HIPS keypoint
(body/detection.rs:121-127) with half-side = distance to the scale/rotation
alignment point (keypoint 1), grown by ``grow_by``; rotation aligns
hips→scale-point with +Y. Between detections the ROI re-derives from the
landmark bounding box with the shoulders/hips midline as the rotation.

The pose model blobs are missing from the reference checkout
(3rdparty/onnx/.MISSING_LARGE_BLOBS); this pipeline activates as soon as
they are dropped into ``assets/onnx/`` (or ``ZARU_TPU_MODELS``), and its
logic is covered by stub-weight tests (tests/test_body_cascade.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..body.detection import Keypoint, PoseNetwork
from ..body.landmark import LandmarkIdx, LiteNetwork as PoseLite, NUM_POSE
from ..geometry import rect_grow_rel
from . import _ops
from .multi_object import MultiObjectTracker

__all__ = ["BodyTracker"]

ROI_PADDING = 0.3
GROW_BY = 1.25  # alignment-point square -> landmark ROI (MediaPipe pose)


def _pose_residual_angle(xy_view):
    """Body rotation vs. upright, in view coords: clockwise angle aligning
    the shoulder-midpoint→hip-midpoint vector with +Y (Y-up), the body
    analog of the palm's wrist→MCP convention (hand/landmark.rs:65-78)."""
    mid_shoulder = (
        xy_view[LandmarkIdx.LEFT_SHOULDER] + xy_view[LandmarkIdx.RIGHT_SHOULDER]
    ) * 0.5
    mid_hip = (xy_view[LandmarkIdx.LEFT_HIP] + xy_view[LandmarkIdx.RIGHT_HIP]) * 0.5
    rel = mid_hip - mid_shoulder
    return jnp.arctan2(-rel[0], rel[1])


class BodyTracker(MultiObjectTracker):
    """Fixed-slot body-pose tracker as one jitted step per frame."""

    def __init__(
        self,
        detector: PoseNetwork | None = None,
        landmarker: PoseLite | None = None,
        *,
        max_bodies: int = 1,
        detect_interval: int = 9,
        detection_threshold: float = 0.5,
        presence_threshold: float = 0.5,
        iou_thresh: float = 0.3,
        compute_dtype=None,
        redetect_bucket: int | None = None,
    ):
        super().__init__(
            detector or PoseNetwork(compute_dtype=compute_dtype),
            landmarker or PoseLite(compute_dtype=compute_dtype),
            residual_angle=_pose_residual_angle,
            grow_by=GROW_BY,
            roi_padding=ROI_PADDING,
            max_objects=max_bodies,
            detect_interval=detect_interval,
            detection_threshold=detection_threshold,
            presence_threshold=presence_threshold,
            iou_thresh=iou_thresh,
            redetect_bucket=redetect_bucket,
            # Full-band fast sampling: any body rotation (lying-down poses
            # included); body views are large, so the 256-px intermediate
            # subsamples big subjects on an integer-stride grid.
            fast_sampler=True,
            sampler_opts={
                "prescale_m": 256, "band_p": 256, "col_split": 1,
                "square_views": True,  # aspect-fit square landmark input
            },
        )

    def _candidate_rois(self, avg_box, avg_kps, avg_angle, fit, res):
        """Square ROI from the hips + scale-point keypoints (in image
        coords), instead of the raw detection box."""
        hips = _ops.unmap_points(avg_kps[:, Keypoint.HIPS], fit, res)
        scale_pt = _ops.unmap_points(avg_kps[:, Keypoint.SCALE_POINT], fit, res)
        side = 2.0 * jnp.linalg.norm(scale_pt - hips, axis=-1, keepdims=True)
        # rect_grow_rel(a) scales the size by (1 + 2a); grow_by is the total
        # scale factor applied to the alignment square.
        rect = rect_grow_rel(
            jnp.concatenate([hips, side, side], axis=-1),
            (self.grow_by - 1.0) / 2.0,
        )
        return jnp.concatenate([rect, avg_angle[:, None]], axis=-1)

    def _finalize_out(self, out):
        # Body-specific output names + pose/aux split
        # (body/landmark.rs:20-78).
        out = dict(out)
        out["pose_flag"] = out.pop("confidence")
        out["visibility"] = out.pop("extra0")
        out["presence"] = out.pop("extra1")
        out["pose_landmarks"] = out["landmarks"][..., :NUM_POSE, :]
        return out
