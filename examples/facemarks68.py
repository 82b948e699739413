"""68-point facial landmark demo (reference: examples/facemarks68.rs)."""

from _common import frame_source

from zaru_tpu import gui
from zaru_tpu.color import Color
from zaru_tpu.detection import Detector
from zaru_tpu.face.detection import ShortRangeNetwork
from zaru_tpu.face.landmark.multipie68 import FaceOnnx
from zaru_tpu.image.draw import Canvas, marker, rect
from zaru_tpu.landmark import Estimator


def main():
    detector = Detector(ShortRangeNetwork())
    estimator = Estimator(FaceOnnx())
    for image in frame_source():
        canvas = Canvas(image)
        for det in detector.detect(image):
            crop_rect = (
                det.bounding_rect()
                .grow_rel(0.15)
                .grow_to_fit_aspect(estimator.input_resolution().aspect_ratio())
            )
            rect(canvas, crop_rect, color=Color.RED)
            lms = estimator.estimate(image.view(crop_rect))
            for p in lms.landmarks_mut().positions():
                # Positions are in view coords; offset to image coords.
                marker(canvas, p[:2] + crop_rect.top_left(), size=2, color=Color.RED)
        gui.show_image("facemarks68", canvas.flush())


if __name__ == "__main__":
    gui.run(main)
