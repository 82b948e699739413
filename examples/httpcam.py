"""HTTP MJPEG camera viewer (reference: examples/httpcam.rs).

Usage: python httpcam.py http://<camera>/stream
"""

import sys

from _common import frame_source  # noqa: F401  (path setup)

from zaru_tpu import gui
from zaru_tpu.timer import FpsCounter
from zaru_tpu.video.httpcam import HttpCam


def main():
    if len(sys.argv) < 2:
        print("usage: httpcam.py <url>")
        return 2
    cam = HttpCam(sys.argv[1])
    fps = FpsCounter("httpcam")
    while True:
        image = cam.read()
        gui.show_image("httpcam", image)
        fps.tick_with(cam.timers())


if __name__ == "__main__":
    gui.run(main)
