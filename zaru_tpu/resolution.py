"""Image resolutions and aspect ratios.

TPU-native counterpart of reference crates/zaru-image/src/resolution.rs.
Pure host-side value types (static shapes are a compile-time concern on TPU,
so these never appear inside jitted code).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


def _gcd(a: int, b: int) -> int:
    while b > 0:
        a, b = b, a % b
    return a


@dataclass(frozen=True)
class AspectRatio:
    """A ratio of width to height (reference: resolution.rs:126-169)."""

    width: int
    height: int

    @staticmethod
    def new(width: int, height: int) -> "AspectRatio | None":
        if width == 0 or height == 0:
            return None
        g = _gcd(width, height)
        return AspectRatio(width // g, height // g)

    def as_f32(self) -> np.float32:
        return np.float32(np.float32(self.width) / np.float32(self.height))

    def __str__(self) -> str:
        return f"{self.width}:{self.height}"


AspectRatio.SQUARE = AspectRatio(1, 1)


@dataclass(frozen=True)
class Resolution:
    """A width×height pixel resolution (reference: resolution.rs:9-105)."""

    width: int
    height: int

    def __post_init__(self):
        assert self.width > 0 and self.height > 0

    @staticmethod
    def new(width: int, height: int) -> "Resolution":
        return Resolution(int(width), int(height))

    def num_pixels(self) -> int:
        return self.width * self.height

    def aspect_ratio(self) -> AspectRatio | None:
        return AspectRatio.new(self.width, self.height)

    def fit_aspect_ratio(self, ratio: AspectRatio):
        """Centered, maximally sized rect inside ``self`` with aspect ``ratio``
        (reference: resolution.rs:63-105)."""
        from .geometry import Rect

        to_ratio = self.aspect_ratio()
        if to_ratio is None:
            return Rect.from_top_left(0.0, 0.0, float(self.width), float(self.height))

        from_ratio = float(ratio.as_f32())
        to_f = float(to_ratio.as_f32())

        if from_ratio > to_f:
            w = float(self.width)
            h = float(self.width) / from_ratio
            x_min = 0.0
            y_min = (float(self.height) - h) / 2.0
        else:
            w = float(self.height) * from_ratio
            h = float(self.height)
            x_min = (float(self.width) - w) / 2.0
            y_min = 0.0
        return Rect.from_top_left(x_min, y_min, w, h)

    def __str__(self) -> str:
        return f"{self.width}x{self.height}"
