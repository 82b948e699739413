"""Body detection demo (reference: examples/body_detection.rs).

Requires pose_detection.onnx, which is missing from the reference checkout;
see assets/ATTRIBUTION.md.
"""

from _common import frame_source

from zaru_tpu import gui
from zaru_tpu.body.detection import PoseNetwork
from zaru_tpu.detection import Detector
from zaru_tpu.image.draw import Canvas, marker, rect


def main():
    detector = Detector(PoseNetwork())
    for image in frame_source():
        canvas = Canvas(image)
        for det in detector.detect(image):
            rect(canvas, det.bounding_rect())
            for kp in det.keypoints():
                marker(canvas, kp)
        gui.show_image("body detection", canvas.flush())


if __name__ == "__main__":
    gui.run(main)
