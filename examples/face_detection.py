"""Face detection demo (reference: examples/face_detection.rs)."""

from _common import frame_source

from zaru_tpu import gui
from zaru_tpu.detection import Detector
from zaru_tpu.face.detection import ShortRangeNetwork
from zaru_tpu.image.draw import Canvas, marker, rotated_rect, text
from zaru_tpu.geometry import RotatedRect
from zaru_tpu.color import Color
from zaru_tpu.timer import FpsCounter


def main():
    detector = Detector(ShortRangeNetwork())
    fps = FpsCounter("face detection")
    for image in frame_source():
        canvas = Canvas(image)
        for det in detector.detect(image):
            rotated_rect(
                canvas,
                RotatedRect.new(det.bounding_rect(), det.angle()),
                color=Color.from_rgb8(170, 0, 0),
            )
            for kp in det.keypoints():
                marker(canvas, kp)
            text(
                canvas,
                det.bounding_rect().center(),
                f"conf={det.confidence():.2f}",
                color=Color.GREEN if det.confidence() > 0.8 else Color.YELLOW,
            )
        gui.show_image("face detection", canvas.flush())
        fps.tick_with(detector.timers())


if __name__ == "__main__":
    gui.run(main)
