"""Head-pose estimation from 68 landmarks via PnP
(reference: examples/pose68.rs)."""

import numpy as np

from _common import frame_source

from zaru_tpu import gui
from zaru_tpu.detection import Detector
from zaru_tpu.face.detection import ShortRangeNetwork
from zaru_tpu.face.landmark.multipie68 import FaceOnnx, reference_positions
from zaru_tpu.image.draw import Canvas, marker, quaternion
from zaru_tpu.landmark import Estimator
from zaru_tpu.pnp import Dlt
from zaru_tpu.procrustes import AnalysisResult


def _quat_from_matrix(m):
    res = AnalysisResult(m, 1.0, np.zeros(3), np.zeros(3), np.zeros(3))
    return res.rotation_quaternion()


def main():
    detector = Detector(ShortRangeNetwork())
    estimator = Estimator(FaceOnnx())
    dlt = Dlt(reference_positions())

    for image in frame_source():
        canvas = Canvas(image)
        dets = list(detector.detect(image))
        if dets:
            det = dets[0]
            crop = (
                det.bounding_rect()
                .grow_rel(0.15)
                .grow_to_fit_aspect(estimator.input_resolution().aspect_ratio())
            )
            lms = estimator.estimate(image.view(crop))
            pos = lms.landmarks_mut().positions()
            for p in pos:
                marker(canvas, p[:2] + crop.top_left(), size=2)
            out = dlt.solve(np.stack([pos[:, 0], -pos[:, 1]], axis=-1))
            q = _quat_from_matrix(out.rotation_matrix)
            center = pos.mean(axis=0)[:2] + crop.top_left()
            quaternion(canvas, center, q, axis_length=40.0)
        gui.show_image("pose68", canvas.flush())


if __name__ == "__main__":
    gui.run(main)
