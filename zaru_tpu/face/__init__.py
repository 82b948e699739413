"""Face perception: detection, landmarks, eye/iris tracking, recognition."""

from . import detection, eye, identify, landmark, recognition

__all__ = ["detection", "eye", "identify", "landmark", "recognition"]
