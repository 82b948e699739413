"""TPU-native flagship demo: the whole detect→track→smooth cascade (plus
optional iris refinement) as one jitted device program (no reference
counterpart — this is the fused path that replaces the reference's thread
pipeline). Pass ``--iris`` to add the eye/iris stage."""

import sys

import numpy as np

from _common import frame_source

from zaru_tpu import gui
from zaru_tpu.color import Color
from zaru_tpu.image.draw import Canvas, marker
from zaru_tpu.pipeline import FaceTracker
from zaru_tpu.timer import FpsCounter


def main():
    iris = "--iris" in sys.argv[1:]
    if iris:
        sys.argv.remove("--iris")  # frame_source parses the remaining argv
    tracker = FaceTracker(iris=iris)
    state = tracker.init_state()
    fps = FpsCounter("fused cascade")

    for image in frame_source():
        state, out = tracker.run_frame(state, image.data)
        canvas = Canvas(image)
        if bool(out["valid"]):
            for p in np.asarray(out["landmarks"]):
                marker(canvas, p[:2], size=2)
            if iris:
                for eye in np.asarray(out["eyes"]):
                    marker(canvas, eye[0, :2], size=4, color=Color.CYAN)
        gui.show_image("fused cascade", canvas.flush())
        fps.tick()


if __name__ == "__main__":
    gui.run(main)
