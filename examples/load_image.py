"""Loads and displays an image file (reference: examples/load_image.rs).

Usage: python load_image.py <file>
"""

import sys

from _common import frame_source  # noqa: F401  (path setup)

from zaru_tpu import gui
from zaru_tpu.assets import fixture_path
from zaru_tpu.image import Image


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else fixture_path("sad_linus.jpg")
    image = Image.load(path)
    print(f"loaded {path}: {image}")
    gui.show_image("image", image)


if __name__ == "__main__":
    gui.run(main)
