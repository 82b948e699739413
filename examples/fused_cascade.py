"""TPU-native flagship demo: the whole detect→track→smooth cascade as one
jitted device program (no reference counterpart — this is the fused path
that replaces the reference's thread pipeline)."""

import numpy as np

from _common import frame_source

from zaru_tpu import gui
from zaru_tpu.image.draw import Canvas, marker
from zaru_tpu.pipeline import FaceTracker
from zaru_tpu.timer import FpsCounter


def main():
    tracker = FaceTracker()
    state = tracker.init_state()
    fps = FpsCounter("fused cascade")

    for image in frame_source():
        state, out = tracker.run_frame(state, image.data)
        canvas = Canvas(image)
        if bool(out["valid"]):
            for p in np.asarray(out["landmarks"]):
                marker(canvas, p[:2], size=2)
        gui.show_image("fused cascade", canvas.flush())
        fps.tick()


if __name__ == "__main__":
    gui.run(main)
