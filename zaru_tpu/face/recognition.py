"""Face recognition embeddings (MobileFaceNet).

The reference exposes this only through an example
(examples/eval_face_recognition.rs:44-90: 112×112 crop → 128-d embedding,
L2-distance matching); here it is a first-class module with batched
embedding support.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from ..assets import model_path
from ..image import as_view
from ..nn import Cnn, CnnInputShape, ColorMapper, NeuralNetwork

__all__ = ["Embedder", "embedding_distance"]


@lru_cache(maxsize=None)
def _cnn() -> Cnn:
    return Cnn(
        NeuralNetwork.load(model_path("mobilefacenet.onnx")),
        CnnInputShape.NCHW,
        # The eval example maps to [-1, 1] (eval_face_recognition.rs:50).
        ColorMapper.linear(-1.0, 1.0),
    )


def embedding_distance(a, b) -> float:
    """L2 distance between embeddings (eval_face_recognition.rs:82-88)."""
    return float(np.linalg.norm(np.asarray(a) - np.asarray(b)))


class Embedder:
    """Computes 128-d face embeddings from (aligned) face crops."""

    def __init__(self):
        self._cnn = _cnn()

    def input_resolution(self):
        return self._cnn.input_resolution()

    def embed(self, image) -> np.ndarray:
        """Embeds a face crop; returns a [128] float32 vector."""
        view = as_view(image)
        rect = view.rect().grow_to_fit_aspect(
            self._cnn.input_resolution().aspect_ratio()
        )
        out = self._cnn.estimate(view.view(rect))
        return np.asarray(out[0]).reshape(128)

    def apply_on_view(self, params, image_u8, rrect):
        """Traceable embed for fused/batched pipelines."""
        return self._cnn.apply_on_view(params, image_u8, rrect)[0].reshape(128)

    @property
    def params(self):
        return self._cnn.params
