"""Fused on-device perception pipelines.

Where the reference pipelines frames across CPU worker threads
(hand/tracking.rs:53-59,165-181), the TPU-native design compiles the whole
detect→crop→landmark→smooth loop into ONE fixed-shape XLA program whose
state (ROIs, filter state, tracking flags) lives in HBM, and batches streams
on the leading axis (vmap) / shards them across chips (parallel.mesh).
"""

from .body_cascade import BodyTracker
from .face_cascade import FaceTracker, FaceTrackerState
from .hand_cascade import MultiHandTracker
from .multi_face import MultiFaceTracker
from .multi_object import MultiObjectTracker

__all__ = [
    "BodyTracker",
    "FaceTracker",
    "FaceTrackerState",
    "MultiHandTracker",
    "MultiFaceTracker",
    "MultiObjectTracker",
]
