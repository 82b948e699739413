"""Hand perception: palm detection, 21-point landmarks, multi-hand tracking."""

from . import detection, landmark, tracking

__all__ = ["detection", "landmark", "tracking"]
