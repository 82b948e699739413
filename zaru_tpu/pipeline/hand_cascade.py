"""Fused multi-hand tracking cascade.

TPU-native reformulation of the reference's thread-per-hand pipeline
(crates/zaru/src/hand/tracking.rs): instead of spawning a worker per tracked
hand and a detector worker (tracking.rs:53-59,165-181), hands live in a
fixed array of ``max_hands`` slots driven by one jitted program per frame
(machinery in :mod:`zaru_tpu.pipeline.multi_object`):

1. palm detection every ``detect_interval`` frames or when no slot is
   active (tracking.rs:210-218), decoded + weighted-NMS'd on device;
2. detections dedup against active slot ROIs (palm box grown 1.5×,
   IoU ≥ 0.3 → discard, tracking.rs:136-156) and fill free slots;
3. ALL slots advance with one vmapped landmark inference (XLA batches the
   per-slot convs onto the MXU — the fixed-shape analog of the reference's
   concurrent workers);
4. ROIs update (padding 0.4, tracking.rs:32-34), lost slots deactivate,
   newer slots overlapping older ones are culled (tracking.rs:197-208).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..hand.detection import LiteNetwork as PalmLite
from ..hand.landmark import LandmarkIdx, LiteNetwork as HandLite
from .multi_object import MultiObjectTracker

__all__ = ["MultiHandTracker"]

ROI_PADDING = 0.4
GROW_BY = 1.5  # palm -> hand


def _palm_residual_angle(xy_view):
    """Palm rotation vs. fingers-up, in view coords
    (hand/landmark.rs:65-78)."""
    rel = xy_view[LandmarkIdx.WRIST] - xy_view[LandmarkIdx.MIDDLE_FINGER_MCP]
    return jnp.arctan2(-rel[0], rel[1])


class MultiHandTracker(MultiObjectTracker):
    """Fixed-slot multi-hand tracker as one jitted step per frame."""

    def __init__(
        self,
        detector: PalmLite | None = None,
        landmarker: HandLite | None = None,
        *,
        max_hands: int = 4,
        detect_interval: int = 9,
        detection_threshold: float = 0.5,
        presence_threshold: float = 0.5,
        iou_thresh: float = 0.3,
        fast_sampler: bool = True,
        compute_dtype=None,
        sampler_opts: dict | None = None,
        redetect_bucket: int | None = None,
    ):
        """``compute_dtype=jnp.bfloat16`` runs both CNN bodies in bf16 —
        a serving-speed knob (~25-35% per model). CAUTION: measured
        landmark deviation vs f32 reached ~21 px on out-of-distribution
        crops (presence shifted ≤ 0.04); the default stays f32 — validate
        on real hands before enabling."""
        super().__init__(
            detector or PalmLite(compute_dtype=compute_dtype),
            landmarker or HandLite(compute_dtype=compute_dtype),
            residual_angle=_palm_residual_angle,
            grow_by=GROW_BY,
            roi_padding=ROI_PADDING,
            max_objects=max_hands,
            detect_interval=detect_interval,
            detection_threshold=detection_threshold,
            presence_threshold=presence_threshold,
            iou_thresh=iou_thresh,
            redetect_bucket=redetect_bucket,
            # Hands rotate arbitrarily (fingers-up canonicalization spans
            # ±180°), so the fast path uses the sampler's FULL-band
            # configuration (band_p == prescale_m): any rotation, bit-exact
            # for palm views <= 256 px, integer-stride beyond.
            # square_views holds (aspect_view_rect fits the square 224x224
            # input), enabling the rolled-window mode (~30% faster).
            fast_sampler=fast_sampler,
            sampler_opts=sampler_opts if sampler_opts is not None else {
                "prescale_m": 256, "band_p": 256, "col_split": 1,
                "square_views": True,
            },
        )

    def _finalize_out(self, out):
        # Hand-specific output names: presence + handedness
        # (hand/landmark.rs:17-23).
        out = dict(out)
        out["presence"] = out.pop("confidence")
        out["handedness"] = out.pop("extra0")
        return out
