"""Body/pose perception: detection + 33-point pose landmarks.

NOTE: the pose model blobs are missing from the reference checkout itself
(3rdparty/onnx/.MISSING_LARGE_BLOBS); the wrappers here are complete (anchor
math, extraction, output selection) and activate as soon as the blobs are
dropped into ``assets/onnx/`` or ``$ZARU_TPU_MODELS``.
"""

from . import detection, landmark

__all__ = ["detection", "landmark"]
