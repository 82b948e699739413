"""Multi-hand detection + tracking (reference: crates/zaru/src/hand/tracking.rs).

The reference pipelines this across CPU worker threads (one per hand plus a
shared detector worker), returning results with one frame of latency. On
TPU the dispatch is already asynchronous and the per-hand landmark inference
batches on device, so this host orchestrator is synchronous and returns
*current-frame* results while keeping the reference's scheduling semantics:

- detection runs when no hands are tracked, or the redetect interval
  elapsed (tracking.rs:210-218);
- fresh detections are IoU-deduplicated against live ROIs with the palm
  box grown 1.5× to hand size (tracking.rs:136-156);
- overlapping trackers are culled, newest first (tracking.rs:197-208);
- trackers use ROI padding 0.4 since the default loses closed hands
  (tracking.rs:32-34).
"""

from __future__ import annotations

import copy
import time
from dataclasses import dataclass
from typing import Callable

from ..detection import Detector
from ..geometry import RotatedRect
from ..landmark import Estimator, LandmarkTracker
from . import detection as palm_detection
from . import landmark as hand_landmark

__all__ = ["HandTracker", "HandId", "HandData"]

ROI_PADDING = 0.4
DEFAULT_IOU_THRESH = 0.3
DEFAULT_REDETECT_INTERVAL = 0.3  # seconds


@dataclass(frozen=True)
class HandId:
    """Unique per-tracker hand ID, stable while the hand stays tracked
    (tracking.rs:228-235)."""

    value: int


@dataclass
class HandData:
    """Per-hand tracking result (tracking.rs:238-266)."""

    id: HandId
    landmark_result: hand_landmark.LandmarkResult
    view_rect: RotatedRect


class _TrackedHand:
    def __init__(self, hand_id: HandId, tracker: LandmarkTracker):
        self.id = hand_id
        self.tracker = tracker
        self.lm: hand_landmark.LandmarkResult | None = None
        self.view_rect: RotatedRect | None = None


class HandTracker:
    """Self-contained hand detector + tracker + landmarker
    (tracking.rs:21-118)."""

    def __init__(
        self,
        detector: palm_detection.LiteNetwork | None = None,
        landmarker_factory: Callable[[], hand_landmark.LiteNetwork] | None = None,
        clock=time.monotonic,
    ):
        self._detector = Detector(detector or palm_detection.LiteNetwork())
        self._make_estimator = landmarker_factory or hand_landmark.LiteNetwork
        self._hands: list[_TrackedHand] = []
        self._next_id = 0
        self._clock = clock
        self._next_det = clock()
        self.det_interval = DEFAULT_REDETECT_INTERVAL
        self.iou_thresh = DEFAULT_IOU_THRESH

    def set_redetect_interval(self, seconds: float) -> None:
        self.det_interval = seconds

    def set_iou_thresh(self, thresh: float) -> None:
        self.iou_thresh = thresh

    def hands(self) -> list[HandData]:
        return [
            HandData(h.id, h.lm, h.view_rect)
            for h in self._hands
            if h.lm is not None
        ]

    def track(self, image) -> None:
        """Advances tracking by one frame; results via :meth:`hands`."""
        # 1. Advance every live tracker; drop the ones that lost tracking.
        survivors = []
        for hand in self._hands:
            result = hand.tracker.track(image)
            if result is not None:
                # Clone-out the landmark result (the estimator reuses it).
                hand.lm = copy.deepcopy(result.estimate())
                hand.view_rect = result.view_rect()
                survivors.append(hand)
        self._hands = survivors

        # 2. Detection scheduling (tracking.rs:210-218).
        detections = []
        now = self._clock()
        if not self._hands or now >= self._next_det:
            detections = list(self._detector.detect(image))
            self._next_det = now + self.det_interval

        # 3. Dedup: discard detections overlapping a live ROI
        #    (tracking.rs:136-156). Palm box grows 1.5x to hand size.
        grow_by = 1.5
        for det in detections:
            hand_rect = det.bounding_rect().grow_rel(grow_by)
            if any(
                h.tracker.roi() is not None
                and h.tracker.roi().rect().iou(hand_rect) >= self.iou_thresh
                for h in self._hands
            ):
                continue

            roi = RotatedRect.new(hand_rect, det.angle())
            estimator = Estimator(self._make_estimator())
            tracker = LandmarkTracker(estimator)
            tracker.set_roi_padding(ROI_PADDING)
            tracker.set_roi(roi)
            hand = _TrackedHand(HandId(self._next_id), tracker)
            self._next_id += 1
            # Run the first tracking step immediately (the reference defers
            # it to the next frame via its worker).
            result = tracker.track(image)
            if result is not None:
                hand.lm = copy.deepcopy(result.estimate())
                hand.view_rect = result.view_rect()
                self._hands.append(hand)

        # 4. Cull overlapping trackers, newest first (tracking.rs:197-208).
        i = len(self._hands) - 1
        while i > 0:
            roi_i = self._hands[i].tracker.roi()
            if roi_i is None:
                i -= 1
                continue
            for j in range(i):
                roi_j = self._hands[j].tracker.roi()
                if roi_j is None:
                    continue
                # IoU on the unrotated rects, like the reference (FIXME
                # there: "IoU computation ignores rotation because hard").
                if roi_i.rect().iou(roi_j.rect()) >= self.iou_thresh:
                    self._hands.pop(i)
                    break
            i -= 1
