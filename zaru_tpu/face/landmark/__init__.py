"""Face landmark estimation networks."""

from . import mediapipe, multipie68

__all__ = ["mediapipe", "multipie68"]
