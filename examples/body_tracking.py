"""Body landmark tracking demo (reference: examples/body_tracking.rs).

Requires the pose_* model blobs, which are missing from the reference
checkout; see assets/ATTRIBUTION.md.
"""

from _common import frame_source

from zaru_tpu import gui
from zaru_tpu.body.detection import PoseNetwork
from zaru_tpu.body.landmark import COARSE_CONNECTIVITY, LiteNetwork
from zaru_tpu.detection import Detector
from zaru_tpu.image.draw import Canvas, line, marker
from zaru_tpu.landmark import Estimator, LandmarkTracker


def main():
    detector = Detector(PoseNetwork())
    tracker = LandmarkTracker(Estimator(LiteNetwork()))

    for image in frame_source():
        canvas = Canvas(image)
        result = tracker.track(image)
        if result is None:
            dets = list(detector.detect(image))
            if dets:
                best = max(dets, key=lambda d: d.confidence())
                tracker.set_roi(best.bounding_rect().grow_rel(0.5))
        else:
            lm = result.estimate()
            pos = lm.landmarks_mut().positions()
            for a, b in COARSE_CONNECTIVITY:
                line(canvas, pos[int(a)][:2], pos[int(b)][:2])
            for p in lm.pose_landmarks():
                marker(canvas, p[:2], size=5)
        gui.show_image("body tracking", canvas.flush())


if __name__ == "__main__":
    gui.run(main)
