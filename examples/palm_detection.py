"""Palm detection demo (reference: examples/palm_detection.rs)."""

from _common import frame_source

from zaru_tpu import gui
from zaru_tpu.detection import Detector
from zaru_tpu.geometry import RotatedRect
from zaru_tpu.hand.detection import LiteNetwork
from zaru_tpu.image.draw import Canvas, marker, rotated_rect
from zaru_tpu.timer import FpsCounter


def main():
    detector = Detector(LiteNetwork())
    fps = FpsCounter("palm detection")
    for image in frame_source():
        canvas = Canvas(image)
        for det in detector.detect(image):
            rotated_rect(canvas, RotatedRect.new(det.bounding_rect(), det.angle()))
            for kp in det.keypoints():
                marker(canvas, kp)
        gui.show_image("palm detection", canvas.flush())
        fps.tick_with(detector.timers())


if __name__ == "__main__":
    gui.run(main)
