"""Host-side debug drawing (zaru_tpu/image/draw.py).

Reference: crates/zaru/src/image/draw.rs — these mirror its primitives
(rect/rotated_rect/marker/line/text/quaternion) at the behavioral level:
each draw touches the expected pixels in the expected color and leaves
the source image untouched (draws return a NEW Image; the Canvas batches
and uploads once on flush).
"""

import numpy as np
import pytest

from zaru_tpu.color import Color
from zaru_tpu.geometry import Rect, RotatedRect
from zaru_tpu.image import Image
from zaru_tpu.image import draw


def black_image(h=64, w=64):
    arr = np.zeros((h, w, 4), np.uint8)
    arr[..., 3] = 255
    return Image(arr)


def rgb(out, x, y):
    return tuple(int(v) for v in np.asarray(out.to_numpy())[y, x, :3])


def test_rect_outline_touches_border_only():
    img = black_image()
    r = Rect.from_top_left(10, 12, 20, 16)
    out = draw.rect(img, r, color=Color.RED)
    a = np.asarray(out.to_numpy())
    # Corners of the outline are red...
    assert rgb(out, 10, 12) == (255, 0, 0)
    assert rgb(out, 30, 28) == (255, 0, 0)
    # ...the interior and far exterior are untouched.
    assert rgb(out, 20, 20) == (0, 0, 0)
    assert rgb(out, 50, 50) == (0, 0, 0)
    # Source image is not mutated (draw returns a new Image).
    assert np.asarray(img.to_numpy())[..., :3].max() == 0
    assert a.shape == (64, 64, 4)


def test_rotated_rect_theta_zero_matches_rect():
    img = black_image()
    rr = RotatedRect.new(Rect.from_center(32, 32, 20, 12), 0.0)
    out = draw.rotated_rect(img, rr, color=Color.GREEN)
    # Upright rotated rect outlines the same axis-aligned box.
    assert rgb(out, 22, 26) == (0, 255, 0)
    assert rgb(out, 42, 38) == (0, 255, 0)
    assert rgb(out, 32, 32) == (0, 0, 0)


def test_marker_cross_center():
    img = black_image()
    out = draw.marker(img, (33, 17), size=7, color=Color.GREEN)
    assert rgb(out, 33, 17) == (0, 255, 0)
    # Cross arms extend horizontally/vertically, not diagonally.
    assert rgb(out, 35, 17) == (0, 255, 0)
    assert rgb(out, 33, 19) == (0, 255, 0)
    assert rgb(out, 35, 19) == (0, 0, 0)


def test_line_endpoints():
    img = black_image()
    out = draw.line(img, (5, 40), (25, 40), color=Color.BLUE)
    assert rgb(out, 5, 40) == (0, 0, 255)
    assert rgb(out, 25, 40) == (0, 0, 255)
    assert rgb(out, 15, 40) == (0, 0, 255)
    assert rgb(out, 15, 41) == (0, 0, 0)


@pytest.mark.parametrize("align", ["center", "top", "bottom", "left", "right"])
def test_text_draws_pixels(align):
    img = black_image()
    out = draw.text(img, (32, 32), "hi", color=Color.WHITE, align=align)
    a = np.asarray(out.to_numpy())[..., :3]
    assert int((a > 0).sum()) > 4  # glyphs rendered somewhere near center
    ys, xs = np.nonzero(a.max(-1))
    assert 10 <= xs.mean() <= 54 and 10 <= ys.mean() <= 54


def test_quaternion_identity_axes():
    img = black_image()
    out = draw.quaternion(img, (32, 32), (1.0, 0.0, 0.0, 0.0), axis_length=10)
    # Identity rotation: X axis points right (red), Y axis points UP in
    # image coords (green; draw.rs:242-245 flips Y), Z projects to a dot.
    assert rgb(out, 42, 32) == (255, 0, 0)
    assert rgb(out, 32, 22) == (0, 255, 0)
    assert rgb(out, 22, 32) == (0, 0, 0)
    assert rgb(out, 32, 42) == (0, 0, 0)


def test_canvas_batches_and_flushes_once():
    img = black_image()
    canvas = draw.Canvas(img)
    # Builder-on-canvas calls return None (no intermediate uploads).
    assert draw.line(canvas, (0, 10), (63, 10), color=Color.RED) is None
    assert draw.marker(canvas, (32, 32), color=Color.GREEN) is None
    out = canvas.flush()
    assert rgb(out, 32, 10) == (255, 0, 0)
    assert rgb(out, 32, 32) == (0, 255, 0)
    # The source Image is untouched through it all.
    assert np.asarray(img.to_numpy())[..., :3].max() == 0
