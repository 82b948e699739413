"""Plays an animated image (reference: examples/animation.rs).

Usage: python animation.py <gif/apng>
"""

import sys
import time

from _common import frame_source  # noqa: F401  (path setup)

from zaru_tpu import gui
from zaru_tpu.video.anim import Animation


def main():
    if len(sys.argv) < 2:
        print("usage: animation.py <file>")
        return 2
    anim = Animation.from_path(sys.argv[1])
    for frame in anim.frames():
        gui.show_image("animation", frame.image_view())
        time.sleep(frame.duration())


if __name__ == "__main__":
    gui.run(main)
