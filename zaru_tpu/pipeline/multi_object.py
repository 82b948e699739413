"""Generic fused multi-object tracking.

The fixed-slot machinery behind :class:`~zaru_tpu.pipeline.MultiHandTracker`
(see hand_cascade.py for the reference mapping), parameterized over any
(detection network, landmark network) pair: palm→hand, face→mesh, body→pose.
One jitted step per frame: scheduled detection, IoU dedup + slot
assignment, one vmapped landmark pass for all slots, ROI update, presence
deactivation, overlap culling.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax

from ..detection.nms import nms_average_device
from ..geometry import rect_grow_rel, rect_iou
from . import _ops

__all__ = ["MultiObjectTracker"]


class MultiObjectTracker:
    """Fixed-slot multi-object tracker as one jitted step per frame.

    Subclasses / callers provide:

    - ``detector``: a DetectionNetwork with ``cnn()`` and
      ``decode_device(outputs, thresh) -> (boxes, conf, kps, angles)``;
    - ``landmarker``: a LandmarkNetwork with ``cnn()`` and
      ``decode_device(outputs) -> (coords [N,3], confidence, *extras)``;
    - ``residual_angle(xy_view) -> scalar``: the object's rotation measured
      from landmarks in view coordinates (added to the ROI rotation);
    - ``grow_by``: detection box → ROI growth factor;
    - ``roi_padding``: relative padding applied to the landmark bounding box.
    """

    def __init__(
        self,
        detector,
        landmarker,
        *,
        residual_angle,
        grow_by: float = 1.0,
        roi_padding: float = 0.3,
        max_objects: int = 4,
        detect_interval: int = 9,
        detection_threshold: float = 0.5,
        presence_threshold: float = 0.5,
        iou_thresh: float = 0.3,
        num_landmarks: int | None = None,
        fast_sampler: bool = False,
        angle_clamp: float | None = None,
        sampler_opts: dict | None = None,
        redetect_bucket: int | None = None,
    ):
        self.detector = detector
        self.landmarker = landmarker
        self.det_cnn = detector.cnn()
        self.lm_cnn = landmarker.cnn()
        self.residual_angle = residual_angle
        self.grow_by = grow_by
        self.roi_padding = roi_padding
        self.max_objects = max_objects
        self.detect_interval = detect_interval
        self.detection_threshold = detection_threshold
        self.presence_threshold = presence_threshold
        self.iou_thresh = iou_thresh
        # Fast-sampler geometry: either the banded default with a VIEW
        # rotation clamp (faces/bodies, near upright), or a full-band
        # configuration (band_p == prescale_m in sampler_opts) supporting
        # arbitrary rotation (hands). The clamp applies only to the
        # sampled view — ROI state and outputs keep true angles.
        self.fast_sampler = fast_sampler
        self.angle_clamp = angle_clamp
        self.sampler_opts = sampler_opts or {}
        # Bounded redetection for the gated batch path (see
        # FaceTracker.redetect_bucket): when set, a LOSS-triggered
        # detection frame detects only the first K all-slots-lost
        # streams; interval/forced redetects still run every stream
        # (missing one would skip — not merely delay — that stream's
        # periodic redetect).
        self.redetect_bucket = redetect_bucket

        self.params = {"det": self.det_cnn.params, "lm": self.lm_cnn.params}
        self._step = jax.jit(self.step)
        self._step_batch = jax.jit(jax.vmap(self.step, in_axes=(None, 0, 0)))
        self._step_batch_gated = jax.jit(self.step_batch)

    # Back-compat alias used by existing tests/code.
    @property
    def max_hands(self) -> int:
        return self.max_objects

    def init_state(self, batch: int | None = None):
        def bcast(x):
            x = jnp.asarray(x)
            return jnp.broadcast_to(x, (batch,) + x.shape) if batch else x

        h = self.max_objects
        return {
            "rois": bcast(jnp.zeros((h, 5), jnp.float32)),
            "active": bcast(jnp.zeros(h, bool)),
            "frame": bcast(jnp.asarray(0, jnp.int32)),
        }

    # --- detection & slot assignment -------------------------------------

    def _detect(self, params, frame):
        """Detector → up to max_objects candidate ROIs in image coords."""
        res = self.det_cnn.input_resolution()
        fit, fit_rrect = _ops.full_frame_fit(frame, res)

        outputs = self.det_cnn.apply_on_view(params["det"], frame, fit_rrect)
        return self._detect_tail(outputs, fit, res)

    def _detect_tail(self, outputs, fit, res):
        boxes, conf, kps, angles = self.detector.decode_device(
            outputs, self.detection_threshold
        )
        valid, _conf, avg_box, avg_kps, avg_angle = nms_average_device(
            boxes, conf, kps, angles, iou_thresh=self.iou_thresh,
            max_out=self.max_objects,
        )
        rois = self._candidate_rois(avg_box, avg_kps, avg_angle, fit, res)
        return rois, valid

    def _detect_batch(self, params, frames):
        """Batched detection for all streams (one fused sampler + CNN
        pass). The full-frame letterbox rect has angle 0, so the exact
        separable two-take sampler applies (bit-identical to the
        per-stream exact path at any scale —
        ops/sampling.letterbox_sample_core). Returns
        (cand_rois [B,S,5], valid [B,S])."""
        res = self.det_cnn.input_resolution()
        fits = jax.vmap(lambda f: _ops.full_frame_fit(f, res)[0])(frames)
        rrects = jnp.concatenate(
            [fits, jnp.zeros((fits.shape[0], 1), jnp.float32)], axis=-1
        )
        xs = self.det_cnn.sample_views_letterbox(frames, rrects)
        outputs = jax.vmap(
            lambda t: self.det_cnn.apply_tensor_hwc(params["det"], t)
        )(xs)
        return jax.vmap(lambda o, f: self._detect_tail(o, f, res))(
            outputs, fits
        )

    def _candidate_rois(self, avg_box, avg_kps, avg_angle, fit, res):
        """NMS'd detections → candidate ROIs [S,5] in image coords.

        Default: detection box grown by ``grow_by`` (hand/tracking.rs:143).
        Subclasses may instead seed from keypoints (e.g. body pose seeds
        from the hips/scale alignment points)."""
        rect = rect_grow_rel(
            _ops.unmap_center_size(avg_box, fit, res), self.grow_by
        )
        return jnp.concatenate([rect, avg_angle[:, None]], axis=-1)

    def _assign(self, state, cand_rois, cand_valid):
        """Assigns non-overlapping candidates to free slots."""

        def body(i, carry):
            rois, active = carry
            cand = cand_rois[i]
            ious = rect_iou(cand[None, 0:4], rois[:, 0:4])
            overlaps = jnp.any(active & (ious >= self.iou_thresh))
            free = jnp.argmin(active)
            have_free = ~active[free]
            do = cand_valid[i] & ~overlaps & have_free
            rois = jnp.where(do, rois.at[free].set(cand), rois)
            active = jnp.where(do, active.at[free].set(True), active)
            return rois, active

        return lax.fori_loop(
            0, self.max_objects, body, (state["rois"], state["active"])
        )

    # --- per-slot tracking -------------------------------------------------

    def _track_slot(self, params, frame, roi):
        """One landmark step on a slot ROI; returns
        (new_roi, confidence, extras tuple, positions [N,3])."""
        res = self.lm_cnn.input_resolution()
        view_rect = _ops.aspect_view_rect(roi, res)
        outputs = self.lm_cnn.apply_on_view(params["lm"], frame, view_rect)
        return self._track_slot_tail(outputs, view_rect, roi)

    def _track_slot_tail(self, outputs, view_rect, roi):
        res = self.lm_cnn.input_resolution()
        coords, confidence, *extras = self.landmarker.decode_device(outputs)
        xy_view, pos = _ops.landmarks_to_image(coords, view_rect, res)
        # view_rect's angle, not roi's: on the fast path the sampled view
        # may be envelope-clamped; the residual is measured relative to
        # the actual view, so this recovers the TRUE object rotation.
        angle = view_rect[4] + self.residual_angle(xy_view)
        new_roi = _ops.padded_roi(pos[:, 0:2], angle, self.roi_padding)
        return new_roi, confidence, tuple(extras), pos

    def _track_slots_batch(self, params, frames, rois):
        """All slots of all streams in ONE fast-sampled landmark pass:
        ``frames [B,H,W,4]``, ``rois [B,S,5]`` — the MXU sampler
        (ops/rotated_fast.py) reads every slot view from the shared frame
        without duplicating it."""
        res = self.lm_cnn.input_resolution()
        view_rects = jax.vmap(
            jax.vmap(lambda r: _ops.aspect_view_rect(r, res))
        )(rois)
        if self.fast_sampler:
            if self.angle_clamp is not None:
                view_rects = view_rects.at[..., 4].set(
                    jnp.clip(view_rects[..., 4],
                             -self.angle_clamp, self.angle_clamp)
                )
            xs = self.lm_cnn.sample_views_fast(
                frames, view_rects, **self.sampler_opts
            )  # [B,S,h,w,3]
            # Flatten [B,S] -> [B*S] around the CNN: a nested vmap keeps
            # two batch dims through every conv, which XLA-TPU lowers
            # ~4.5x slower than one flat batch (33.8 vs 7.5 ms for 256
            # FaceMesh-192 inferences, measured 2026-08-18). The
            # reshapes are free and the outputs bit-identical.
            b, s = xs.shape[:2]
            outs_flat = jax.vmap(
                lambda t: self.lm_cnn.apply_tensor_hwc(params["lm"], t)
            )(xs.reshape((b * s,) + xs.shape[2:]))
            outputs = jax.tree_util.tree_map(
                lambda o: o.reshape((b, s) + o.shape[1:]), outs_flat
            )
        else:
            # Exact sampler: per-(stream, slot) sampling may stay nested
            # (gathers are fine under vmap) but the CNN must still see
            # ONE flat batch — vmap(vmap(apply_on_view)) kept two batch
            # dims through every conv, the documented ~4.5x XLA-TPU
            # pessimization the fast branch above avoids.
            xs = jax.vmap(
                lambda f, vrs: jax.vmap(
                    lambda vr: self.lm_cnn.sample_view_hwc(f, vr)
                )(vrs)
            )(frames, view_rects)  # [B,S,h,w,3]
            b, s = xs.shape[:2]
            outs_flat = jax.vmap(
                lambda t: self.lm_cnn.apply_tensor_hwc(params["lm"], t)
            )(xs.reshape((b * s,) + xs.shape[2:]))
            outputs = jax.tree_util.tree_map(
                lambda o: o.reshape((b, s) + o.shape[1:]), outs_flat
            )
        return jax.vmap(jax.vmap(self._track_slot_tail))(
            outputs, view_rects, rois
        )

    # --- the fused step ------------------------------------------------------

    def _roi_phase(self, params, state, frame):
        """Scheduled detection + slot assignment (per stream)."""
        do_detect = (~jnp.any(state["active"])) | (
            state["frame"] % self.detect_interval == 0
        )

        def with_detection(_):
            cand_rois, cand_valid = self._detect(params, frame)
            return self._assign(state, cand_rois, cand_valid)

        def without_detection(_):
            return state["rois"], state["active"]

        return lax.cond(do_detect, with_detection, without_detection, None)

    def _post(self, state, rois, active, new_rois, confidence, extras, pos):
        """Presence gating, overlap culling, fixed-shape outputs."""
        keep = active & (confidence >= self.presence_threshold)
        rois = jnp.where(keep[:, None], new_rois, rois)

        # Cull newer slots overlapping older active slots.
        s = self.max_objects
        ious = rect_iou(rois[:, None, 0:4], rois[None, :, 0:4])
        older = jnp.tril(jnp.ones((s, s), bool), k=-1)
        overlap_older = jnp.any(
            older & (ious >= self.iou_thresh) & keep[None, :] & keep[:, None],
            axis=1,
        )
        keep = keep & ~overlap_older

        new_state = {"rois": rois, "active": keep, "frame": state["frame"] + 1}
        z = keep.astype(jnp.float32)
        out = {
            "landmarks": pos * z[:, None, None],
            "confidence": confidence * z,
            "rois": rois * z[:, None],
            "valid": keep,
        }
        for i, ex in enumerate(extras):
            out[f"extra{i}"] = ex * z.reshape(z.shape + (1,) * (ex.ndim - 1))
        return new_state, self._finalize_out(out)

    def _finalize_out(self, out: dict) -> dict:
        """Domain-specific output renames (overridden by subclasses)."""
        return out

    def step(self, params, state, frame):
        """One frame; fixed-shape outputs: landmarks [S,N,3],
        confidence [S], extras, rois [S,5], valid [S]."""
        rois, active = self._roi_phase(params, state, frame)
        new_rois, confidence, extras, pos = jax.vmap(
            lambda r: self._track_slot(params, frame, r)
        )(rois)
        return self._post(state, rois, active, new_rois, confidence, extras, pos)

    def step_batch(self, params, state, frames, force_detect=False):
        """Batched step over a stream axis with a batch-level detection
        gate (the analog of FaceTracker.step_batch): while every stream is
        tracking and no stream hits its redetect interval, only the
        batched fast-sampled landmark pass runs; otherwise the per-stream
        ROI phase executes under vmap. State carries a leading [B] axis
        (``init_state(batch=B)``)."""
        lost = ~jnp.any(state["active"], axis=1)  # [B] all slots inactive
        interval_due = state["frame"] % self.detect_interval == 0
        any_detect = jnp.logical_or(
            force_detect, jnp.any(lost | interval_due)
        )

        def roi_full(_):
            # Batched detection once for ALL streams (a per-stream cond
            # under vmap would execute the detector for every stream
            # anyway, per-stream and unfused), then per-stream slot
            # assignment only where that stream is due a detection.
            cand_rois, cand_valid = self._detect_batch(params, frames)
            do_detect = lost | interval_due

            def pick(st, cr, cv, do):
                rois, active = self._assign(st, cr, cv)
                return (
                    jnp.where(do, rois, st["rois"]),
                    jnp.where(do, active, st["active"]),
                )

            return jax.vmap(pick)(state, cand_rois, cand_valid, do_detect)

        def roi_keep(_):
            return state["rois"], state["active"]

        if self.redetect_bucket:
            # Bounded loss recovery: gather the first K lost streams
            # (static shapes), detect + assign only those, scatter back.
            # Interval/forced frames take the all-streams branch so the
            # periodic cadence is never skipped.
            def roi_bucket(_):
                k = min(int(self.redetect_bucket), int(lost.shape[0]))
                idx = jnp.argsort(~lost, stable=True)[:k]  # lost first
                sel = lost[idx]
                cand_rois, cand_valid = self._detect_batch(
                    params, frames[idx]
                )
                sub = jax.tree_util.tree_map(lambda a: a[idx], state)

                def pick(st, cr, cv, do):
                    rois, active = self._assign(st, cr, cv)
                    return (
                        jnp.where(do, rois, st["rois"]),
                        jnp.where(do, active, st["active"]),
                    )

                rois_k, active_k = jax.vmap(pick)(
                    sub, cand_rois, cand_valid, sel
                )
                return (
                    state["rois"].at[idx].set(rois_k),
                    state["active"].at[idx].set(active_k),
                )

            def detect(x):
                return lax.cond(
                    jnp.asarray(force_detect) | jnp.any(interval_due),
                    roi_full,
                    roi_bucket,
                    x,
                )
        else:
            detect = roi_full

        rois, active = lax.cond(any_detect, detect, roi_keep, None)
        new_rois, confidence, extras, pos = self._track_slots_batch(
            params, frames, rois
        )
        return jax.vmap(self._post)(
            state, rois, active, new_rois, confidence, extras, pos
        )

    # --- host API -------------------------------------------------------------

    def run_frame(self, state, frame):
        return self._step(self.params, state, frame)

    def run_frames(self, state, frames):
        """Batched ungated step: ``vmap(step)`` — per-stream ``lax.cond``
        detection scheduling, but the vmap keeps TWO batch dims through
        the landmark CNN (the documented ~4.5x XLA-TPU conv
        pessimization). Prefer :meth:`run_frames_gated` for serving; this
        path exists for per-stream-schedule semantics parity."""
        return self._step_batch(self.params, state, frames)

    def run_frames_gated(self, state, frames):
        """Batched step with the batch-level gate + MXU fast sampling —
        the fastest multi-stream serving path."""
        return self._step_batch_gated(self.params, state, frames)
