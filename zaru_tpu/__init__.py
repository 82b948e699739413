"""zaru_tpu — a TPU-native machine-perception framework.

A from-scratch rebuild of the capabilities of placrosse/Zaru (a Rust/wgpu
MediaPipe-style perception library) designed for TPU hardware: the entire
detect→crop→landmark cascade runs as fused, fixed-shape XLA programs on
device; models are imported from ONNX into pure JAX functions; multi-stream
serving shards over chips with jax.sharding.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):

- ``geometry``/``resolution``/``color``/``approx`` — L0 math (f32 parity).
- ``image`` + ``ops`` — L1 image layer: HBM-resident RGBA images, lazy
  rotated-rect views, fused sampling gathers (replaces wgpu + WGSL).
- ``onnx`` + ``nn`` — L2 inference runtime: ONNX→JAX importer, `Cnn` fusing
  sample+infer into one XLA program (replaces tract/ort/wonnx).
- ``detection`` / ``landmark`` — L3 engines: anchors, weighted-average NMS,
  ROI tracking, all expressible on device with fixed shapes.
- ``face`` / ``hand`` / ``body`` — L4 model wrappers and pipelines.
- ``video`` / ``gui`` — host I/O and debug output.
- ``pipeline`` / ``parallel`` — fused single-jit cascades and multi-chip
  sharding (the TPU-native replacement for thread-based pipelining).
"""

__version__ = "0.1.0"

from . import (
    approx,
    assets,
    color,
    filters,
    geometry,
    num,
    quat,
    resolution,
    timer,
)
from .color import Color
from .geometry import Rect, RotatedRect
from .resolution import AspectRatio, Resolution

# Heavier subsystems (jax-importing) are regular submodules:
#   zaru_tpu.{image, nn, onnx, detection, landmark, face, hand, body,
#             pipeline, parallel, train, video, gui, procrustes, pnp}

__all__ = [
    "Color",
    "Rect",
    "RotatedRect",
    "AspectRatio",
    "Resolution",
    "approx",
    "assets",
    "color",
    "filters",
    "geometry",
    "num",
    "quat",
    "resolution",
    "timer",
]
