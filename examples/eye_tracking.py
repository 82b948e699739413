"""Iris/eye tracking demo: face mesh → eye crops → iris landmarks.

No direct reference example, but exercises the reference's eye module
(crates/zaru/src/face/eye.rs) end-to-end the way its docs describe.
"""

import numpy as np

from _common import frame_source

from zaru_tpu import gui
from zaru_tpu.color import Color
from zaru_tpu.detection import Detector
from zaru_tpu.face.detection import ShortRangeNetwork
from zaru_tpu.face.eye import EyeNetwork
from zaru_tpu.face.landmark.mediapipe import FaceMeshV1
from zaru_tpu.image import Image
from zaru_tpu.image.draw import Canvas, marker
from zaru_tpu.landmark import Estimator, LandmarkTracker
from zaru_tpu.resolution import Resolution


def main():
    detector = Detector(ShortRangeNetwork())
    tracker = LandmarkTracker(Estimator(FaceMeshV1()))
    eye_est = Estimator(EyeNetwork())

    for image in frame_source():
        canvas = Canvas(image)
        result = tracker.track(image)
        if result is None:
            dets = list(detector.detect(image))
            if dets:
                tracker.set_roi(max(dets, key=lambda d: d.confidence()).bounding_rect())
            gui.show_image("eye tracking", canvas.flush())
            continue

        mesh = result.estimate()
        for eye_rect, flip in ((mesh.left_eye(), False), (mesh.right_eye(), True)):
            # Grow to the network's square aspect BEFORE materializing so
            # the crop carries real pixels (the reference's composing
            # views sample the root image, eye.rs:82; materializing a
            # non-square crop would make the estimator's aspect growth
            # read black bands instead).
            grown = eye_rect.grow_rel(0.8).grow_to_fit_aspect(1.0)
            view = image.view(grown)
            crop = view.to_image()
            if flip:
                arr = crop.to_numpy()[:, ::-1]
                lms = eye_est.estimate(Image(np.ascontiguousarray(arr)))
                lms.flip_horizontal_in_place(
                    Resolution(arr.shape[1], arr.shape[0])
                )
            else:
                lms = eye_est.estimate(crop)
            # Crop coords → image coords via the rotated view transform.
            center = grown.transform_out(lms.iris_center()[:2])
            marker(canvas, center, size=4, color=Color.CYAN)
            for p in lms.eye_contour()[:16]:
                marker(canvas, grown.transform_out(p[:2]), size=1, color=Color.MAGENTA)
        gui.show_image("eye tracking", canvas.flush())


if __name__ == "__main__":
    gui.run(main)
