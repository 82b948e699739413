"""Fused multi-hand tracking cascade.

TPU-native reformulation of the reference's thread-per-hand pipeline
(crates/zaru/src/hand/tracking.rs): instead of spawning a worker per tracked
hand and a detector worker (tracking.rs:53-59,165-181), hands live in a
fixed array of ``max_hands`` slots. Each frame, ONE jitted program:

1. runs palm detection every ``detect_interval`` frames or when no slot is
   active (tracking.rs:210-218), decoding + weighted-NMS on device;
2. deduplicates detections against active slot ROIs (palm box grown 1.5×,
   IoU ≥ 0.3 → discard, tracking.rs:136-156) and assigns survivors to free
   slots;
3. advances ALL slots with one vmapped landmark inference (XLA batches the
   per-slot convs onto the MXU — the fixed-shape analog of the reference's
   concurrent workers);
4. updates ROIs (padding 0.4, tracking.rs:32-34), deactivates slots whose
   presence dropped below threshold, and culls newer slots that overlap
   older ones (tracking.rs:197-208).

vmap over a leading stream axis for multi-camera serving; shard over chips
with parallel.mesh.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..detection.nms import nms_average_device
from ..geometry import (
    rect_grow_rel,
    rect_grow_to_fit_aspect,
    rect_iou,
    rrect_bounding,
    rrect_transform_out,
)
from ..hand.detection import LiteNetwork as PalmLite
from ..hand.landmark import LandmarkIdx, LiteNetwork as HandLite

__all__ = ["MultiHandTracker"]

ROI_PADDING = 0.4
GROW_BY = 1.5  # palm -> hand


class MultiHandTracker:
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
    ):
        self.detector = detector or PalmLite()
        self.landmarker = landmarker or HandLite()
        self.det_cnn = self.detector.cnn()
        self.lm_cnn = self.landmarker.cnn()
        self.max_hands = max_hands
        self.detect_interval = detect_interval
        self.detection_threshold = detection_threshold
        self.presence_threshold = presence_threshold
        self.iou_thresh = iou_thresh

        self.params = {"det": self.det_cnn.params, "lm": self.lm_cnn.params}
        self._step = jax.jit(self.step)
        self._step_batch = jax.jit(jax.vmap(self.step, in_axes=(None, 0, 0)))

    def init_state(self, batch: int | None = None):
        def bcast(x):
            x = jnp.asarray(x)
            return jnp.broadcast_to(x, (batch,) + x.shape) if batch else x

        h = self.max_hands
        return {
            "rois": bcast(jnp.zeros((h, 5), jnp.float32)),
            "active": bcast(jnp.zeros(h, bool)),
            "frame": bcast(jnp.asarray(0, jnp.int32)),
        }

    # --- detection & slot assignment -------------------------------------

    def _detect(self, params, frame):
        """Palm detection → up to max_hands candidate hand ROIs in image
        coords: (rois [H,5], valid [H])."""
        h, w = frame.shape[0], frame.shape[1]
        res = self.det_cnn.input_resolution()
        aspect = np.float32(res.width) / np.float32(res.height)
        fit = rect_grow_to_fit_aspect(
            jnp.asarray([w / 2.0, h / 2.0, float(w), float(h)], jnp.float32), aspect
        )
        fit_rrect = jnp.concatenate([fit, jnp.zeros(1, jnp.float32)])

        outputs = self.det_cnn.apply_on_view(params["det"], frame, fit_rrect)
        boxes, conf, kps, angles = self.detector.decode_device(
            outputs, self.detection_threshold
        )
        valid, _conf, avg_box, _kp, avg_angle = nms_average_device(
            boxes, conf, kps, angles, iou_thresh=self.iou_thresh, max_out=self.max_hands
        )

        scale = fit[2] / np.float32(res.width)
        top_left = fit[0:2] - fit[2:4] * 0.5
        center = avg_box[:, 0:2] * scale + top_left
        size = avg_box[:, 2:4] * scale
        # Palm box -> hand ROI (grow 1.5x), keep palm angle
        # (tracking.rs:158-162).
        hand_rect = rect_grow_rel(
            jnp.concatenate([center, size], axis=-1), GROW_BY
        )
        rois = jnp.concatenate([hand_rect, avg_angle[:, None]], axis=-1)
        return rois, valid

    def _assign(self, state, cand_rois, cand_valid):
        """Assigns non-overlapping candidates to free slots
        (tracking.rs:136-194)."""

        def body(i, carry):
            rois, active = carry
            cand = cand_rois[i]
            # IoU of candidate hand rect vs active slot rects (unrotated,
            # like the reference).
            ious = rect_iou(cand[None, 0:4], rois[:, 0:4])
            overlaps = jnp.any(active & (ious >= self.iou_thresh))
            free = jnp.argmin(active)  # first inactive slot
            have_free = ~active[free]
            do = cand_valid[i] & ~overlaps & have_free
            rois = jnp.where(
                do, rois.at[free].set(cand), rois
            )
            active = jnp.where(do, active.at[free].set(True), active)
            return rois, active

        return lax.fori_loop(0, self.max_hands, body, (state["rois"], state["active"]))

    # --- per-slot tracking -------------------------------------------------

    def _track_slot(self, params, frame, roi):
        """One hand-landmark step on a slot ROI (landmark.rs:463-501 with
        the palm-rotation estimate). Returns (new_roi, presence,
        handedness, positions [21,3])."""
        res = self.lm_cnn.input_resolution()
        aspect = np.float32(res.width) / np.float32(res.height)
        view_rect = jnp.concatenate(
            [rect_grow_to_fit_aspect(roi[0:4], aspect), roi[4:5]]
        )
        outputs = self.lm_cnn.apply_on_view(params["lm"], frame, view_rect)
        coords, presence, handedness = self.landmarker.decode_device(outputs)

        scale = view_rect[2] / np.float32(res.width)
        xy_view = coords[:, 0:2] * scale
        z = coords[:, 2:3] * scale

        # Palm rotation in view coords (hand/landmark.rs:65-78), added to
        # the ROI rotation.
        rel = xy_view[LandmarkIdx.WRIST] - xy_view[LandmarkIdx.MIDDLE_FINGER_MCP]
        angle = roi[4] + jnp.arctan2(-rel[0], rel[1])

        xy = rrect_transform_out(view_rect, xy_view)
        pos = jnp.concatenate([xy, z], axis=-1)

        new_roi = rrect_bounding(angle, xy)
        new_roi = jnp.concatenate(
            [rect_grow_rel(new_roi[0:4], ROI_PADDING), new_roi[4:5]]
        )
        return new_roi, presence, handedness, pos

    # --- the fused step ------------------------------------------------------

    def step(self, params, state, frame):
        """One frame; returns (state, outputs) with fixed shapes:
        landmarks [H,21,3], presence [H], handedness [H], rois [H,5],
        valid [H]."""
        do_detect = (~jnp.any(state["active"])) | (
            state["frame"] % self.detect_interval == 0
        )

        def with_detection(_):
            cand_rois, cand_valid = self._detect(params, frame)
            return self._assign(state, cand_rois, cand_valid)

        def without_detection(_):
            return state["rois"], state["active"]

        rois, active = lax.cond(do_detect, with_detection, without_detection, None)

        # Advance every slot (inactive ones masked afterwards).
        new_rois, presence, handedness, pos = jax.vmap(
            lambda r: self._track_slot(params, frame, r)
        )(rois)

        keep = active & (presence >= self.presence_threshold)
        rois = jnp.where(keep[:, None], new_rois, rois)

        # Cull newer slots overlapping older active slots
        # (tracking.rs:197-208).
        ious = rect_iou(rois[:, None, 0:4], rois[None, :, 0:4])  # [H,H]
        older = jnp.tril(jnp.ones((self.max_hands, self.max_hands), bool), k=-1)
        overlap_older = jnp.any(
            older & (ious >= self.iou_thresh) & keep[None, :] & keep[:, None], axis=1
        )
        keep = keep & ~overlap_older

        new_state = {
            "rois": rois,
            "active": keep,
            "frame": state["frame"] + 1,
        }
        z = keep.astype(jnp.float32)
        out = {
            "landmarks": pos * z[:, None, None],
            "presence": presence * z,
            "handedness": handedness * z,
            "rois": rois * z[:, None],
            "valid": keep,
        }
        return new_state, out

    # --- host API -------------------------------------------------------------

    def run_frame(self, state, frame):
        return self._step(self.params, state, frame)

    def run_frames(self, state, frames):
        return self._step_batch(self.params, state, frames)
