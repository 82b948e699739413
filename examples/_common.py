"""Shared helpers for the examples: frame sources that fall back from
webcam to a static image / fixture so every example also runs headless."""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Honor a CPU override even in environments whose sitecustomize force-
# registers a TPU platform (JAX_PLATFORMS alone is not enough there).
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

from zaru_tpu.assets import fixture_path
from zaru_tpu.image import Image


def frame_source(argv=None, loop_static: int = 30):
    """Yields frames: from a file given on the CLI, else the webcam, else
    the bundled fixture photo (repeated ``loop_static`` times, overridable
    via ZARU_TPU_EXAMPLE_FRAMES for quick smoke runs)."""
    import os

    loop_static = int(os.environ.get("ZARU_TPU_EXAMPLE_FRAMES", loop_static))
    argv = sys.argv[1:] if argv is None else argv
    if argv:
        img = Image.load(argv[0])
        for _ in range(loop_static):
            yield img
        return
    try:
        from zaru_tpu.video.webcam import Webcam, WebcamOptions

        cam = Webcam.open(WebcamOptions())
        while True:
            yield cam.read()
    except RuntimeError:
        img = Image.load(fixture_path("sad_linus.jpg"))
        for _ in range(loop_static):
            yield img
