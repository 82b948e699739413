"""Video input sources: V4L2 webcams, HTTP MJPEG cameras, animated images."""

from . import anim, file, httpcam, webcam
from .anim import Animation
from .file import VideoFile
from .httpcam import HttpCam
from .webcam import ParamPreference, Webcam, WebcamOptions

__all__ = [
    "anim",
    "file",
    "VideoFile",
    "httpcam",
    "webcam",
    "Animation",
    "HttpCam",
    "Webcam",
    "WebcamOptions",
    "ParamPreference",
]
