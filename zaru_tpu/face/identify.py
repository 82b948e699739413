"""Face identification: detection + embedding + on-device gallery matching.

Capability extension: the reference only evaluates embeddings in an example
(eval_face_recognition.rs); this module packages enrollment and 1:N
identification, with the gallery resident on device so matching stays a
single [G,128]×[128] distance computation regardless of gallery size.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..detection import Detector
from ..image import as_view
from .detection import ShortRangeNetwork
from .recognition import Embedder

__all__ = ["FaceIdentifier", "Match"]


@dataclass(frozen=True)
class Match:
    name: str
    distance: float


@jax.jit
def _distances(gallery, query):
    diff = gallery - query[None, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1))


class FaceIdentifier:
    """Enroll faces by name, then identify faces in new images.

    Embeddings are L2-normalized before matching, so ``threshold`` is a
    distance on the unit sphere: same-person pairs typically land below
    ~0.9, different people above ~1.2. (The reference example compares raw
    unnormalized distances, whose scale depends on the input; normalization
    makes the threshold portable.)
    """

    def __init__(self, threshold: float = 1.0, detector=None, embedder=None):
        self.threshold = threshold
        self._detector = detector or Detector(ShortRangeNetwork())
        self._embedder = embedder or Embedder()
        self._names: list[str] = []
        self._gallery: jnp.ndarray | None = None  # [G, 128] on device

    def _embed_face(self, image) -> np.ndarray | None:
        dets = list(self._detector.detect(image))
        if not dets:
            return None
        best = max(dets, key=lambda d: d.confidence())
        crop = best.bounding_rect().grow_rel(0.2)
        emb = self._embedder.embed(as_view(image).view(crop))
        return emb / np.linalg.norm(emb)

    def enroll(self, name: str, image) -> bool:
        """Adds the most confident face in ``image`` under ``name``.
        Returns False if no face was found."""
        emb = self._embed_face(image)
        if emb is None:
            return False
        self._names.append(name)
        row = jnp.asarray(emb)[None, :]
        self._gallery = (
            row if self._gallery is None else jnp.concatenate([self._gallery, row])
        )
        return True

    def __len__(self) -> int:
        return len(self._names)

    def identify(self, image) -> Match | None:
        """Identifies the most confident face; returns None when no face is
        found or the best gallery distance exceeds the threshold."""
        if self._gallery is None:
            return None
        emb = self._embed_face(image)
        if emb is None:
            return None
        d = np.asarray(_distances(self._gallery, jnp.asarray(emb)))
        i = int(np.argmin(d))
        if d[i] > self.threshold:
            return None
        return Match(self._names[i], float(d[i]))
