"""Multi-hand tracking demo (reference: examples/hand_tracking.rs)."""

from _common import frame_source

from zaru_tpu import gui
from zaru_tpu.color import Color
from zaru_tpu.hand.landmark import CONNECTIVITY
from zaru_tpu.hand.tracking import HandTracker
from zaru_tpu.image.draw import Canvas, line, marker, text
from zaru_tpu.timer import FpsCounter


def main():
    tracker = HandTracker()
    fps = FpsCounter("hand tracking")
    for image in frame_source():
        tracker.track(image)
        canvas = Canvas(image)
        for hand in tracker.hands():
            lm = hand.landmark_result
            pos = lm.landmarks.positions()
            for a, b in CONNECTIVITY:
                line(canvas, pos[int(a)][:2], pos[int(b)][:2])
            for p in pos:
                marker(canvas, p[:2], size=3)
            text(
                canvas,
                lm.palm_center()[:2],
                f"#{hand.id.value} {lm.handedness().value}",
                color=Color.CYAN,
            )
        gui.show_image("hand tracking", canvas.flush())
        fps.tick()


if __name__ == "__main__":
    gui.run(main)
