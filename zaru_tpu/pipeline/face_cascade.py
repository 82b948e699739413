"""Fused face detect→ROI→landmark→smooth cascade.

This is the TPU-native reformulation of the reference's per-frame drive loop
(examples/facemesh.rs:33-60 + landmark.rs:463-501): one jitted, fixed-shape
step function per frame. Everything — BlazeFace, ROI seeding, rotated-crop
sampling, Face Mesh, 1€ smoothing, ROI update — runs on device; the host
only supplies frames and reads back landmarks.

Control flow: `lax.cond(tracking, track, detect_and_track)`. Detection
re-seeds in the *same* frame (one better than the reference's one-frame
pipeline latency). Under `vmap` (multi-stream batching) both branches
execute masked per XLA semantics; the detector is small relative to the
landmarker, so the steady-state cost stays close to landmark-only.

State is a pytree of arrays, so the tracker vmaps over a stream axis and
shards over a device mesh unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..detection.nms import nms_average_device
from ..face.detection import ShortRangeNetwork
from ..face.landmark.mediapipe import FaceMeshV1, LandmarkIdx
from ..filters import OneEuroFilter
from ..geometry import rect_grow_rel, rrect_bounding, signed_angle_to_x
from . import _ops

__all__ = ["FaceTracker", "FaceTrackerState", "default_face_sampler_opts"]


def default_face_sampler_opts(lm_cnn) -> dict:
    """Fast-sampler config for the face landmark shapes: the sampler's
    own auto config (cs=6 / rpb=32 / x-roll at FaceMesh shapes), whose
    x-window AND y-band coverage proofs both hold at ANY rotation.

    History: round 3 briefly forced band_p=192 / rows_per_block=64 here
    (~0.3 ms/step faster upright at batch 128, examples/r3bench5.py),
    but rotation mixes output ROWS into source x, so that config's
    64-row blocks exceed the 128-column x-roll window at steep
    rotations for views >= ~400 px — up to ~22% black fill, caught by
    review and reproduced. The corrected `covered()` proof in
    ops/rotated_fast.py now rejects rpb > cols at XW=128, and this
    function returns the proven auto config; re-adding a faster block
    shape requires a coverage proof, not just a benchmark.
    """
    del lm_cnn
    return {}

FaceTrackerState = dict  # pytree: roi [5], tracking [], filter state


class FaceTracker:
    """Single-jit face tracking cascade.

    Parameters mirror the host classes: detection threshold
    (detection.rs:167), tracking loss threshold and ROI padding
    (landmark.rs:370-372), optional 1€ landmark smoothing applied in
    network coordinates like the reference (landmark.rs:292-308).
    """

    def __init__(
        self,
        detector: ShortRangeNetwork | None = None,
        landmarker: FaceMeshV1 | None = None,
        *,
        detection_threshold: float = 0.5,
        loss_threshold: float = 0.5,
        roi_padding: float = 0.3,
        smooth: OneEuroFilter | None = OneEuroFilter(min_cutoff=1.0, beta=0.5),
        frame_rate: float = 30.0,
        compute_dtype=None,
        fast_sampler: bool = True,
        iris: bool = False,
        sampler_opts: dict | None = None,
        redetect_bucket: int | None = None,
    ):
        self.detector = detector or ShortRangeNetwork(compute_dtype=compute_dtype)
        self.landmarker = landmarker or FaceMeshV1(compute_dtype=compute_dtype)
        self.det_cnn = self.detector.cnn()
        self.lm_cnn = self.landmarker.cnn()
        self.iris = iris
        if iris:
            from ..face.eye import EyeNetwork

            self.eye_net = EyeNetwork()
            self.eye_cnn = self.eye_net.cnn()
        self.detection_threshold = detection_threshold
        self.loss_threshold = loss_threshold
        self.roi_padding = roi_padding
        self.smooth = smooth
        self.fast_sampler = fast_sampler
        # Default: the banded sampler's auto configuration, whose y-band
        # provably covers ANY view rotation at the FaceMesh shapes
        # (ops/rotated_fast.py `any_rotation`) — matching the reference's
        # any-angle rotated views (image/mod.rs:224-247). Round 2 clamped
        # the sampled view to ±0.5 rad here; the clamp is gone. (The
        # rolled full-band mode also handles any rotation but measured
        # ~10 ms/step slower at batch 128 — examples/r3bench.py.)
        self.sampler_opts = (
            default_face_sampler_opts(self.lm_cnn)
            if sampler_opts is None else sampler_opts
        )
        # Bounded redetection for the gated batch path: when set, an
        # unforced detection frame samples + detects only the first K
        # lost streams (static shapes) instead of the whole batch,
        # capping the gate's worst-case frame cost at detector(K) when a
        # single stream drops. None keeps the all-streams branch (best
        # steady-state simplicity; the measured tradeoff is in
        # BENCHMARKS.md "batch gate"). Forced-cadence detection frames
        # always redetect every stream either way.
        self.redetect_bucket = redetect_bucket
        self.elapsed = 1.0 / frame_rate
        self.num_landmarks = len(self.landmarker.init_estimate().landmarks_mut())

        self.params = {
            "det": self.det_cnn.params,
            "lm": self.lm_cnn.params,
        }
        if iris:
            self.params["eye"] = self.eye_cnn.params
        self._step = jax.jit(self.step)
        self._step_batch = jax.jit(jax.vmap(self.step, in_axes=(None, 0, 0)))
        self._step_batch_gated = jax.jit(self.step_batch)

        # Built once: re-jitting a fresh closure per call would recompile
        # the whole scan program every invocation.
        @jax.jit
        def _scan_video(params, state, frames):
            def body(st, frame):
                st, out = self.step(params, st, frame)
                return st, out

            return lax.scan(body, state, frames)

        self._scan_video = _scan_video

    # --- state ---------------------------------------------------------------

    def init_state(self, batch: int | None = None) -> FaceTrackerState:
        """Fresh (not-tracking) state; pass ``batch`` for a stream axis."""

        def bcast(x):
            x = jnp.asarray(x)
            return jnp.broadcast_to(x, (batch,) + x.shape) if batch else x

        filt = (
            {
                k: bcast(v)
                for k, v in self.smooth.init_state((self.num_landmarks, 3)).items()
            }
            if self.smooth
            else {}
        )
        return {
            "roi": bcast(jnp.zeros(5, jnp.float32)),
            "tracking": bcast(jnp.asarray(False)),
            "filter": filt,
        }

    # --- traced step ----------------------------------------------------------

    def _detect_roi(self, params, frame):
        """BlazeFace → best (weighted-averaged) detection → seed ROI.

        Mirrors Detector::detect_impl (detection.rs:216-270) + the example's
        `tracker.set_roi(detection.bounding_rect())` (facemesh.rs:50-54):
        the seed ROI is the unrotated bounding rect. Returns (roi [5],
        found bool).
        """
        res = self.det_cnn.input_resolution()
        fit, fit_rrect = _ops.full_frame_fit(frame, res)

        outputs = self.det_cnn.apply_on_view(params["det"], frame, fit_rrect)
        return self._detect_tail(outputs, fit, res)

    def _detect_tail(self, outputs, fit, res):
        boxes, conf, kps, angles = self.detector.decode_device(
            outputs, self.detection_threshold
        )
        valid, seed_conf, avg_box, avg_kp, avg_angle = nms_average_device(
            boxes, conf, kps, angles, max_out=1
        )
        rect = _ops.unmap_center_size(avg_box[0], fit, res)
        roi = jnp.concatenate([rect, jnp.zeros(1, jnp.float32)])
        return roi, valid[0]

    def _detect_batch(self, params, frames):
        """Batched detection for all streams: exact letterbox-sampled
        crops (the full-frame fit rect has angle 0, so the separable
        two-take sampler is bit-identical to the per-stream exact path at
        any scale — ops/sampling.letterbox_sample_core) + one batched
        BlazeFace pass. Returns (rois [B,5], founds [B])."""
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

    def _detect_bucket(self, params, state, frames):
        """Bounded redetection: detect only the first K lost streams.

        K = ``self.redetect_bucket`` (static). Lost streams are gathered
        to the front (stable argsort on the tracking mask), their K
        frames sampled + detected as one batched pass, and the resulting
        ROIs scattered back; any further lost streams drain on subsequent
        frames at K per frame. This bounds the detection-gate's
        worst-case frame cost at detector(K) instead of detector(B) when
        a single stream drops — the batched, static-shape analog of the
        reference's per-stream redetection on host threads
        (hand/tracking.rs:41). Returns (rois [B,5], founds [B],
        seeded [B]) with tracked streams' ROIs bit-identically carried.
        """
        tr = state["tracking"]
        k = min(int(self.redetect_bucket), int(tr.shape[0]))
        idx = jnp.argsort(tr, stable=True)[:k]  # lost (False) sort first
        sel = jnp.logical_not(tr[idx])  # bucket slots that are really lost
        rois_k, found_k = self._detect_batch(params, frames[idx])
        apply = sel & found_k
        rois = state["roi"].at[idx].set(
            jnp.where(apply[:, None], rois_k, state["roi"][idx])
        )
        founds = tr.at[idx].set(tr[idx] | apply)
        seeded = jnp.zeros_like(tr).at[idx].set(sel)
        return rois, founds, seeded

    def _track(self, params, state, frame, roi, seeded):
        """One landmark-tracking step (landmark.rs:463-501), traced."""
        res = self.lm_cnn.input_resolution()
        view_rect = _ops.aspect_view_rect(roi, res)
        outputs = self.lm_cnn.apply_on_view(params["lm"], frame, view_rect)
        return self._track_tail(state, outputs, view_rect, roi, seeded)

    def _track_batch(self, params, state, frames, rois, seeded):
        """Batched track step over a stream axis.

        With ``fast_sampler`` (default), the rotated-ROI crops for ALL
        streams come from one MXU-based sampler call
        (ops/rotated_fast.py) instead of a per-stream XLA gather — the
        gather is the fused cascade's dominant cost (~61 ms/step at batch
        128 vs ~18 ms fast; BENCHMARKS.md). Sampling is within ~1 source
        px of the exact path; set ``fast_sampler=False`` for bitwise
        sampling parity.
        """
        res = self.lm_cnn.input_resolution()
        view_rects = jax.vmap(lambda r: _ops.aspect_view_rect(r, res))(rois)
        if self.fast_sampler:
            # Rolled-window full-band sampling (default sampler_opts):
            # exact at ANY rotation — no view-angle clamp (reference
            # semantics image/mod.rs:224-247; the round-2 ±0.5 rad clamp
            # is gone).
            xs = self.lm_cnn.sample_views_fast(
                frames, view_rects, **self.sampler_opts
            )
            outputs = jax.vmap(
                lambda t: self.lm_cnn.apply_tensor_hwc(params["lm"], t)
            )(xs)
        else:
            outputs = jax.vmap(
                lambda f, vr: self.lm_cnn.apply_on_view(params["lm"], f, vr)
            )(frames, view_rects)
        new_state, out = jax.vmap(self._track_tail)(
            state, outputs, view_rects, rois, seeded
        )
        if self.iris:
            out = dict(out, eyes=self._iris_batch(params, frames, out["landmarks"]))
        return new_state, out

    def _track_tail(self, state, outputs, view_rect, roi, seeded):
        """Decode → smooth → unmap → ROI update (landmark.rs:463-501)."""
        res = self.lm_cnn.input_resolution()
        # FaceMeshV2 returns an extra tongueOut value; ignore trailing extras.
        coords, conf, *_extras = self.landmarker.decode_device(outputs)
        coords = coords[: self.num_landmarks]

        # Smooth in network coordinates (landmark.rs:292-308). Freshly
        # seeded trackers reset the filter state.
        if self.smooth:
            fstate = state["filter"]
            fstate = jax.tree_util.tree_map(
                lambda s: jnp.where(
                    jnp.reshape(seeded, (1,) * s.ndim), jnp.zeros_like(s), s
                ),
                fstate,
            )
            fstate, coords = self.smooth.apply(fstate, coords, self.elapsed)
        else:
            fstate = state["filter"]

        xy_view, pos = _ops.landmarks_to_image(coords, view_rect, res)
        xy = pos[:, 0:2]

        # Face rotation from outer eye corners, measured in VIEW coordinates
        # (the estimate's residual rotation relative to the rotated ROI),
        # then added to the ROI rotation — exactly like the host tracker
        # (landmark.rs:479 + mediapipe.rs:146-160).
        ltr = (
            xy_view[LandmarkIdx.RIGHT_EYE_OUTER_CORNER]
            - xy_view[LandmarkIdx.LEFT_EYE_OUTER_CORNER]
        )
        # The residual is measured relative to the sampled view, so
        # adding the view's angle recovers the TRUE face rotation (also
        # correct if a caller overrides sampler_opts with a clamped
        # banded config).
        angle = view_rect[4] + signed_angle_to_x(ltr)

        new_roi = _ops.padded_roi(xy, angle, self.roi_padding)
        tracking = conf >= self.loss_threshold

        new_state = {"roi": new_roi, "tracking": tracking, "filter": fstate}
        out = {
            "landmarks": pos,
            "confidence": conf,
            "roi": new_roi,
            "valid": tracking,
        }
        return new_state, out

    # --- iris refinement (BASELINE config 4, reference face/eye.rs) ---------

    _LEFT_EYE = (
        int(LandmarkIdx.LEFT_EYE_BOTTOM),
        int(LandmarkIdx.LEFT_EYE_OUTER_CORNER),
        int(LandmarkIdx.LEFT_EYE_INNER_CORNER),
        int(LandmarkIdx.LEFT_EYE_TOP),
    )
    _RIGHT_EYE = (
        int(LandmarkIdx.RIGHT_EYE_BOTTOM),
        int(LandmarkIdx.RIGHT_EYE_INNER_CORNER),
        int(LandmarkIdx.RIGHT_EYE_OUTER_CORNER),
        int(LandmarkIdx.RIGHT_EYE_TOP),
    )
    EYE_GROW = 0.8  # examples/eye_tracking.py host semantics

    def _eye_view_rects(self, pos):
        """Landmarks (image coords) → [2, 5] aspect-fit eye view rects
        (mediapipe.rs:163-199 + the estimator's aspect growth)."""
        res = self.eye_cnn.input_resolution()
        angle = signed_angle_to_x(
            pos[LandmarkIdx.RIGHT_EYE_OUTER_CORNER, :2]
            - pos[LandmarkIdx.LEFT_EYE_OUTER_CORNER, :2]
        )

        def one(idx):
            r = rrect_bounding(angle, pos[jnp.asarray(idx), :2])
            r = jnp.concatenate(
                [rect_grow_rel(r[0:4], self.EYE_GROW), r[4:5]]
            )
            return _ops.aspect_view_rect(r, res)

        return jnp.stack([one(self._LEFT_EYE), one(self._RIGHT_EYE)])

    def _iris_decode(self, outputs, view_rect, flip):
        """(eye [1,213], iris [1,15]) → [76,3] image-coord landmarks; iris
        center first (eye.rs:70-140). ``flip`` un-mirrors right eyes."""
        res = self.eye_cnn.input_resolution()
        eye = outputs[0].reshape(71, 3)
        iris = outputs[1].reshape(5, 3)
        coords = jnp.concatenate([iris, eye], axis=0)
        x = jnp.where(flip, np.float32(res.width) - coords[:, 0], coords[:, 0])
        coords = jnp.concatenate([x[:, None], coords[:, 1:]], axis=-1)
        _xyv, pos = _ops.landmarks_to_image(coords, view_rect, res)
        return pos

    def _iris_single(self, params, frame, pos):
        """Per-stream exact-path iris refinement → [2, 76, 3]."""
        rects = self._eye_view_rects(pos)
        flips = jnp.asarray([False, True])

        def one(rect, flip):
            t = self.eye_cnn.sample_view_hwc(frame, rect)
            t = jnp.where(flip, t[:, ::-1, :], t)
            outputs = self.eye_cnn.apply_tensor_hwc(params["eye"], t)
            return self._iris_decode(outputs, rect, flip)

        return jax.vmap(one)(rects, flips)

    def _iris_batch(self, params, frames, pos):
        """Batched fast-path iris refinement → [B, 2, 76, 3]."""
        rects = jax.vmap(self._eye_view_rects)(pos)          # [B, 2, 5]
        # Eye views are small (~0.35x face size); a 256-px intermediate
        # keeps them bit-exact at a quarter of the default prescale cost,
        # and the full band (band_p == prescale_m) supports any eye
        # rotation without clamping.
        xs = self.eye_cnn.sample_views_fast(
            frames, rects, prescale_m=256, band_p=256, col_split=1,
            square_views=True,  # aspect-fit square 64x64 eye views
        )
        xs = xs.at[:, 1].set(xs[:, 1, :, ::-1, :])           # mirror right eyes
        # Flatten [B,2] -> [2B] around the CNN: nested-vmapped convs keep
        # two batch dims and lower ~4.5x slower than one flat batch on
        # XLA-TPU (see multi_object._track_slots_batch); reshapes are
        # free and bit-identical.
        b = xs.shape[0]
        outs_flat = jax.vmap(
            lambda t: self.eye_cnn.apply_tensor_hwc(params["eye"], t)
        )(xs.reshape((2 * b,) + xs.shape[2:]))
        outputs = jax.tree_util.tree_map(
            lambda o: o.reshape((b, 2) + o.shape[1:]), outs_flat
        )
        flips = jnp.broadcast_to(jnp.asarray([False, True]), rects.shape[:2])
        return jax.vmap(jax.vmap(self._iris_decode))(outputs, rects, flips)

    def step(self, params, state: FaceTrackerState, frame):
        """One frame: returns ``(new_state, outputs)``.

        ``frame``: ``[H, W, 4] uint8`` in HBM. Outputs: landmarks
        ``[468, 3]`` in image coords, confidence, roi, valid flag.

        Structure note: the ``lax.cond`` only picks the ROI *source*
        (carried state vs. fresh detection) and the landmark pass runs
        exactly once. Wrapping the whole track step in both cond branches
        instead lowers catastrophically under ``vmap`` (XLA executes both
        selected branch bodies without fusing the duplicated gathers —
        measured ~45× slower at batch 128).
        """
        tracking = state["tracking"]

        def keep_roi(_):
            return state["roi"], jnp.asarray(True)

        def detect(_):
            return self._detect_roi(params, frame)

        roi, found = lax.cond(tracking, keep_roi, detect, None)
        seeded = ~tracking

        new_state, out = self._track(params, state, frame, roi, seeded)
        # A failed detection (lost & nothing found) stays lost/invalid.
        new_state = dict(new_state, tracking=new_state["tracking"] & found)
        out = dict(out, valid=out["valid"] & found)
        if self.iris:
            out["eyes"] = self._iris_single(params, frame, out["landmarks"])
        return new_state, out

    def step_batch(self, params, state, frames, force_detect=False):
        """Batched step with a *batch-level* detection gate.

        Under ``vmap``, per-stream ``lax.cond`` lowers to a select that
        executes BOTH branches for every stream every frame. Here the
        predicate is batch-scalar — "are all streams tracking?" — so XLA
        executes only one branch at runtime: the steady state costs
        landmark-only, and a detection pass (for every stream) runs only on
        frames where some stream is lost. This trades a little redundant
        detection (all streams redetect together) for skipping the detector
        entirely in the common case. Both branches track via
        :meth:`_track_batch` (batched fast sampler).

        ``force_detect`` (traced bool) forces the detection branch — the
        production redetect cadence (hand/tracking.rs:41).

        With ``redetect_bucket=K``, an unforced detection frame runs the
        bounded :meth:`_detect_bucket` (detector over K lost streams)
        instead of the all-streams pass, trading redetect drain rate
        (K streams/frame) for a bounded worst-case frame cost.

        Structure note: only the ROI *sources* go through the cond — the
        landmark pass (`_track_batch`) runs unconditionally after it.
        Round 3 measured the earlier both-branches-run-the-tracker shape
        costing ~3 ms/step extra at batch 128: the cond boundary carried
        the full landmark output pytree and split the step into XLA
        computations that could not fuse/overlap.
        """
        all_tracking = jnp.all(state["tracking"]) & jnp.logical_not(force_detect)
        tr = state["tracking"]

        def keep(_):
            return state["roi"], jnp.ones_like(tr), jnp.zeros_like(tr)

        def full(_):
            # Batched detection for every stream (one fused sampler+CNN
            # pass — cheaper AND simpler than a vmapped per-stream
            # lax.cond, which executes both branches anyway), then a
            # per-stream select keeps tracked streams' carried ROIs.
            det_rois, det_founds = self._detect_batch(params, frames)
            rois = jnp.where(tr[:, None], state["roi"], det_rois)
            return rois, tr | det_founds, ~tr

        if self.redetect_bucket:
            # Bounded worst case: an unforced detection frame (some
            # stream lost) detects only K streams; the forced cadence
            # still redetects everyone.
            def detect(x):
                return lax.cond(
                    jnp.asarray(force_detect),
                    full,
                    lambda _: self._detect_bucket(params, state, frames),
                    x,
                )
        else:
            detect = full

        rois, founds, seeded = lax.cond(all_tracking, keep, detect, None)
        new_state, out = self._track_batch(params, state, frames, rois, seeded)
        new_state = dict(new_state, tracking=new_state["tracking"] & founds)
        out = dict(out, valid=out["valid"] & founds)
        return new_state, out

    # --- convenience host API -------------------------------------------------

    def run_frame(self, state, frame):
        """Jitted single-stream step."""
        return self._step(self.params, state, frame)

    def run_frames(self, state, frames):
        """Jitted batched step: ``frames [B, H, W, 4]``, state with leading
        stream axis (from ``init_state(batch=B)``)."""
        return self._step_batch(self.params, state, frames)

    def run_frames_gated(self, state, frames):
        """Batched step with the batch-level detection gate (see
        :meth:`step_batch`) — the fastest steady-state serving path."""
        return self._step_batch_gated(self.params, state, frames)

    def scan_video(self, state, frames):
        """Processes ``frames [T, H, W, 4]`` in one compiled lax.scan —
        useful for offline video and for benchmarking steady-state cost."""
        return self._scan_video(self.params, state, frames)
