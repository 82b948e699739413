"""Model/fixture asset resolution.

The reference compiles ONNX blobs into the binary via ``include_blob!``
(reference: crates/zaru/build.rs:1-3). Here, weights are on-disk assets
resolved at first use and cached per-process. Search order:

1. ``$ZARU_TPU_MODELS`` (colon-separated directories)
2. ``<repo>/assets/onnx``
3. ``/root/reference/3rdparty/onnx`` (the mounted reference checkout, if any)
"""

from __future__ import annotations

import os
from pathlib import Path

__all__ = ["model_path", "fixture_path", "ModelMissingError", "MISSING_MODELS"]

_REPO_ROOT = Path(__file__).resolve().parent.parent

# Blobs absent from the reference checkout itself
# (reference: 3rdparty/onnx/.MISSING_LARGE_BLOBS).
MISSING_MODELS = frozenset(
    {
        "hand_landmark_full.onnx",
        "palm_detection_full.onnx",
        "pose_detection.onnx",
        "pose_landmark_full.onnx",
        "pose_landmark_lite.onnx",
    }
)


class ModelMissingError(FileNotFoundError):
    """A model blob is not available in any search directory."""


def _search_dirs() -> list[Path]:
    dirs = []
    env = os.environ.get("ZARU_TPU_MODELS")
    if env:
        dirs.extend(Path(p) for p in env.split(":") if p)
    dirs.append(_REPO_ROOT / "assets" / "onnx")
    dirs.append(Path("/root/reference/3rdparty/onnx"))
    return dirs


def model_path(filename: str) -> Path:
    for d in _search_dirs():
        p = d / filename
        if p.is_file():
            return p
    hint = (
        " (this blob is also missing from the upstream reference checkout; "
        "obtain it from MediaPipe and drop it into assets/onnx/ or set "
        "ZARU_TPU_MODELS)"
        if filename in MISSING_MODELS
        else ""
    )
    raise ModelMissingError(f"model {filename!r} not found{hint}")


def fixture_path(filename: str) -> Path:
    for d in (_REPO_ROOT / "assets" / "img", Path("/root/reference/3rdparty/img")):
        p = d / filename
        if p.is_file():
            return p
    raise FileNotFoundError(f"fixture {filename!r} not found")
