"""Fused multi-face tracking cascade.

Capability extension beyond the reference (which tracks a single face in
its examples): the same fixed-slot machinery as the multi-hand pipeline,
configured for BlazeFace → Face Mesh. Tracks up to ``max_faces`` faces per
stream in one jitted step per frame.
"""

from __future__ import annotations

from ..face.detection import ShortRangeNetwork
from ..face.landmark.mediapipe import FaceMeshV1, LandmarkIdx
from ..geometry import signed_angle_to_x
from .face_cascade import default_face_sampler_opts
from .multi_object import MultiObjectTracker

__all__ = ["MultiFaceTracker"]


def _face_residual_angle(xy_view):
    """Face rotation from outer eye corners, view coords
    (mediapipe.rs:146-160)."""
    ltr = (
        xy_view[LandmarkIdx.RIGHT_EYE_OUTER_CORNER]
        - xy_view[LandmarkIdx.LEFT_EYE_OUTER_CORNER]
    )
    return signed_angle_to_x(ltr)


class MultiFaceTracker(MultiObjectTracker):
    """Fixed-slot multi-face tracker as one jitted step per frame."""

    def __init__(
        self,
        detector: ShortRangeNetwork | None = None,
        landmarker: FaceMeshV1 | None = None,
        *,
        max_faces: int = 4,
        detect_interval: int = 9,
        detection_threshold: float = 0.5,
        loss_threshold: float = 0.5,
        iou_thresh: float = 0.3,
        redetect_bucket: int | None = None,
    ):
        landmarker = landmarker or FaceMeshV1()
        super().__init__(
            detector or ShortRangeNetwork(),
            landmarker,
            residual_angle=_face_residual_angle,
            grow_by=0.0,  # detection box used as-is (facemesh.rs:50-54)
            roi_padding=0.3,
            max_objects=max_faces,
            detect_interval=detect_interval,
            detection_threshold=detection_threshold,
            presence_threshold=loss_threshold,
            iou_thresh=iou_thresh,
            # Banded auto config: exact at ANY face rotation (the y-band
            # coverage proof holds at FaceMesh shapes), no angle clamp —
            # reference semantics image/mod.rs:224-247. Blocking per the
            # measured-best face config (r3bench5).
            fast_sampler=True,
            sampler_opts=default_face_sampler_opts(landmarker.cnn()),
            redetect_bucket=redetect_bucket,
        )
