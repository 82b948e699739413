"""Face perception: detection, landmarks, eye/iris tracking, recognition."""

from . import detection, eye, landmark

__all__ = ["detection", "eye", "landmark"]
