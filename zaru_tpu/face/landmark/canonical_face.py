"""Reference 3D landmark positions, parsed from the vendored .obj meshes.

The reference bakes these into Rust constant arrays
(3rdparty/3d/canonical_face_model.rs `REFERENCE_POSITIONS`,
3rdparty/3d/multipie68.rs); here they are parsed once from the same
MediaPipe/MultiPIE mesh data (assets/3d/*.obj) and cached.
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

import numpy as np

_ASSETS_3D = Path(__file__).resolve().parents[3] / "assets" / "3d"


@lru_cache(maxsize=None)
def _load_obj_vertices(name: str) -> np.ndarray:
    path = _ASSETS_3D / name
    if not path.is_file():
        path = Path("/root/reference/3rdparty/3d") / name
    verts = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(t) for t in line.split()[1:4]])
    return np.asarray(verts, np.float32)


def __getattr__(name):
    if name == "REFERENCE_POSITIONS":
        return _load_obj_vertices("canonical_face_model.obj")
    if name == "MULTIPIE68_POSITIONS":
        return _load_obj_vertices("multipie68.obj")
    raise AttributeError(name)
