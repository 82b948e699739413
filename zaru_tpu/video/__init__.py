"""Video input sources: V4L2 webcams, HTTP MJPEG cameras, animated images."""

from . import anim, httpcam, webcam
from .anim import Animation
from .httpcam import HttpCam
from .webcam import ParamPreference, Webcam, WebcamOptions

__all__ = [
    "anim",
    "httpcam",
    "webcam",
    "Animation",
    "HttpCam",
    "Webcam",
    "WebcamOptions",
    "ParamPreference",
]
