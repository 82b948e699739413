"""Webcam viewer (reference: examples/webcam.rs)."""

from _common import frame_source  # noqa: F401  (path setup)

from zaru_tpu import gui
from zaru_tpu.timer import FpsCounter
from zaru_tpu.video.webcam import Webcam, WebcamOptions


def main():
    cam = Webcam.open(WebcamOptions())
    print(f"opened webcam: {cam.resolution()} @ {cam.fps():.0f} fps")
    fps = FpsCounter("webcam")
    while True:
        image = cam.read()
        gui.show_image("webcam", image)
        fps.tick_with(cam.timers())


if __name__ == "__main__":
    gui.run(main)
