"""Face mesh tracking demo (reference: examples/facemesh.rs)."""

from _common import frame_source

from zaru_tpu import gui
from zaru_tpu.color import Color
from zaru_tpu.detection import Detector
from zaru_tpu.face.detection import ShortRangeNetwork
from zaru_tpu.face.landmark.mediapipe import FaceMeshV1
from zaru_tpu.image.draw import Canvas, marker, rect
from zaru_tpu.landmark import Estimator, LandmarkTracker
from zaru_tpu.timer import FpsCounter


def main():
    detector = Detector(ShortRangeNetwork())
    tracker = LandmarkTracker(Estimator(FaceMeshV1()))
    fps = FpsCounter("facemesh")

    for image in frame_source():
        canvas = Canvas(image)
        result = tracker.track(image)
        if result is not None:
            for p in result.estimate().landmarks_mut().positions():
                marker(canvas, p[:2], size=2)
        else:
            detections = list(detector.detect(image))
            best = max(detections, key=lambda d: d.confidence(), default=None)
            if best is not None:
                tracker.set_roi(best.bounding_rect())
                rect(canvas, best.bounding_rect(), color=Color.BLUE)
        gui.show_image("facemesh", canvas.flush())
        fps.tick_with(list(detector.timers()) + list(tracker.timers()))


if __name__ == "__main__":
    gui.run(main)
