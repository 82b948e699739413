"""SSD anchor generation (reference: crates/zaru/src/detection/ssd.rs).

Anchors are returned as a ``[N, 2] float32`` array of (x, y) centers in the
0..1 range — one row per anchor, ``boxes_per_cell`` duplicates per feature
cell, rows iterating x fastest then y, layers in order (ssd.rs:96-125).
The array form feeds straight into the vectorized device decode.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["LayerInfo", "Anchors"]


@dataclass(frozen=True)
class LayerInfo:
    """One SSD output layer: boxes per cell + feature-map size
    (ssd.rs:42-64)."""

    boxes_per_cell: int
    width: int
    height: int

    def __post_init__(self):
        assert self.boxes_per_cell > 0


class Anchors:
    """A list of SSD anchor centers (ssd.rs:85-125)."""

    def __init__(self, centers: np.ndarray):
        assert centers.ndim == 2 and centers.shape[1] == 2
        self.centers = centers.astype(np.float32)

    @staticmethod
    def calculate(layers: list[LayerInfo]) -> "Anchors":
        rows = []
        for layer in layers:
            ys, xs = np.mgrid[0 : layer.height, 0 : layer.width]
            cx = (xs.ravel() + 0.5) / layer.width
            cy = (ys.ravel() + 0.5) / layer.height
            cell = np.stack([cx, cy], axis=-1)
            rows.append(np.repeat(cell, layer.boxes_per_cell, axis=0))
        return Anchors(np.concatenate(rows, axis=0))

    def anchor_count(self) -> int:
        return len(self.centers)

    def __len__(self) -> int:
        return len(self.centers)

    def __getitem__(self, i: int) -> np.ndarray:
        return self.centers[i]
