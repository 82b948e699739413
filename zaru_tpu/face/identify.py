"""Face identification: detection + embedding + on-device gallery matching.

Capability extension: the reference only evaluates embeddings in an example
(eval_face_recognition.rs); this module packages enrollment and 1:N
identification, with the gallery resident on device so matching stays a
single [G,128]×[128] distance computation regardless of gallery size.

Two tiers:

- :class:`FaceIdentifier` — host-loop enrollment + 1:1 identification on
  single images (detection → crop → embed → match).
- :class:`StreamIdentifier` — fused batched serving: rides on a
  :class:`~zaru_tpu.pipeline.FaceTracker`'s gated fast path and adds, in
  the same jitted step, an MXU-sampled 112×112 crop per stream, one
  batched MobileFaceNet pass, and the gallery distance/argmin — so B
  streams are tracked AND identified per frame without leaving the chip.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..detection import Detector
from ..geometry import rect_grow_rel
from ..image import as_view
from .detection import ShortRangeNetwork
from .recognition import Embedder

__all__ = ["FaceIdentifier", "Match", "StreamIdentifier"]


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

    @property
    def names(self) -> list[str]:
        return list(self._names)

    @property
    def gallery(self):
        """[G, 128] L2-normalized embeddings on device (None if empty)."""
        return self._gallery


class StreamIdentifier:
    """Fused tracking + identification over batched streams.

    One jitted step per frame: the wrapped
    :class:`~zaru_tpu.pipeline.FaceTracker` advances every stream on its
    gated fast path, then the tracked ROI (unrotated bounding rect grown
    like :meth:`FaceIdentifier._embed_face`, matching
    eval_face_recognition.rs:44-56 semantics) is MXU-sampled to the
    embedder's 112×112 input for ALL streams at once, embedded in one
    batched MobileFaceNet pass, L2-normalized, and matched against the
    on-device gallery. Outputs gain:

    - ``identity``: [B] int32 gallery row of the best match, -1 when the
      stream has no valid face or the distance exceeds ``threshold``;
    - ``identity_distance``: [B] f32 unit-sphere L2 distance to that row.

    Enroll via :class:`FaceIdentifier` (or pass ``names, embeddings`` to
    :meth:`set_gallery`); translate rows to names with ``names[i]``.
    """

    def __init__(
        self,
        tracker=None,
        embedder: Embedder | None = None,
        *,
        threshold: float = 1.0,
        crop_grow: float = 0.2,
    ):
        from ..pipeline import FaceTracker

        self.tracker = tracker or FaceTracker()
        self.embedder = embedder or Embedder()
        self.threshold = threshold
        self.crop_grow = crop_grow
        self.names: list[str] = []
        self._gallery = jnp.zeros((0, 128), jnp.float32)
        self.params = dict(self.tracker.params, emb=self.embedder.params)
        self._step = jax.jit(self.step)

    def set_gallery(self, names, embeddings) -> None:
        """Installs a [G, 128] gallery (rows are L2-normalized copies)."""
        emb = jnp.asarray(embeddings, jnp.float32)
        assert emb.ndim == 2 and emb.shape[0] == len(names)
        self.names = list(names)
        norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        self._gallery = emb / jnp.maximum(norm, 1e-12)

    def adopt(self, identifier: FaceIdentifier) -> None:
        """Copies an enrolled :class:`FaceIdentifier`'s gallery."""
        if identifier.gallery is None:
            raise ValueError("identifier has no enrolled faces")
        self.set_gallery(identifier.names, identifier.gallery)

    def init_state(self, batch: int):
        return self.tracker.init_state(batch=batch)

    # --- traced ---------------------------------------------------------

    def _embed_batch(self, params, frames, rois):
        """[B] tracked ROIs → [B, 128] L2-normalized embeddings."""
        cnn = self.embedder._cnn
        res = cnn.input_resolution()

        # The tracked ROI is the landmark bounding box grown by the
        # tracker's roi_padding; the embedding wants the host path's
        # face-box-grown-by-crop_grow framing. rect_grow_rel adds
        # ``amount`` per SIDE (size × (1 + 2·amount), rect.rs:85-96), so
        # the compensating growth solves (1+2g) = (1+2cg)/(1+2rp):
        # g = (cg − rp) / (1 + 2·rp). (The earlier
        # (1+cg)/(1+rp) − 1 form over-shrank the crop ~3.3% vs the host
        # FaceIdentifier framing; framing dominates MobileFaceNet's
        # embedding — cross-photo same-person distance 0.40 vs 1.32
        # uncompensated on the fixture pair.)
        grow = (self.crop_grow - self.tracker.roi_padding) / (
            1.0 + 2.0 * self.tracker.roi_padding
        )

        def crop_rect(roi):
            # AXIS-ALIGNED bounding rect of the tracked ROI, re-framed and
            # aspect-fitted (the embedding model is trained on
            # loosely-aligned upright faces).
            from ..geometry import rect_grow_to_fit_aspect, rrect_bounding

            rect = rrect_bounding(jnp.float32(0.0), _roi_corners(roi))
            rect = rect_grow_rel(rect[0:4], grow)
            aspect = np.float32(res.width) / np.float32(res.height)
            rect = rect_grow_to_fit_aspect(rect, aspect)
            return jnp.concatenate([rect, jnp.zeros(1, jnp.float32)])

        rects = jax.vmap(crop_rect)(rois)
        xs = cnn.sample_views_fast(frames, rects)  # [B, 112, 112, 3]
        embs = jax.vmap(
            lambda t: cnn.apply_tensor_hwc(params["emb"], t)[0].reshape(128)
        )(xs)
        norm = jnp.linalg.norm(embs, axis=-1, keepdims=True)
        return embs / jnp.maximum(norm, 1e-12)

    def step(self, params, state, frames, gallery=None, threshold=None):
        """(state, frames [B,H,W,4]) → (state, outputs + identity).

        ``threshold`` defaults to ``self.threshold``; pass it as a traced
        argument (like :meth:`run_frames` does) when it may change after
        the first call — a jitted trace bakes the default in as a
        constant."""
        gallery = self._gallery if gallery is None else gallery
        threshold = self.threshold if threshold is None else threshold
        new_state, out = self.tracker.step_batch(params, state, frames)
        embs = self._embed_batch(params, frames, out["roi"])
        if gallery.shape[0] == 0:
            b = frames.shape[0]
            ident = jnp.full((b,), -1, jnp.int32)
            dist = jnp.full((b,), jnp.inf, jnp.float32)
        else:
            d = jnp.linalg.norm(
                embs[:, None, :] - gallery[None, :, :], axis=-1
            )  # [B, G]
            ident = jnp.argmin(d, axis=-1).astype(jnp.int32)
            dist = jnp.min(d, axis=-1)
            ok = out["valid"] & (dist <= threshold)
            ident = jnp.where(ok, ident, -1)
            dist = jnp.where(out["valid"], dist, jnp.inf)
        out = dict(out, identity=ident, identity_distance=dist, embedding=embs)
        return new_state, out

    # --- host API -------------------------------------------------------

    def run_frames(self, state, frames):
        """Jitted batched tracking + identification step."""
        return self._step(
            self.params, state, frames, self._gallery,
            jnp.float32(self.threshold),
        )


def _roi_corners(roi):
    """[5] rrect → [4, 2] corner points (for the unrotated bounding)."""
    from ..geometry import rotate_ccw

    cx, cy, w, h, th = (roi[i] for i in range(5))
    pts = jnp.asarray([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])
    xy = pts * jnp.asarray([w * 0.5, h * 0.5])
    # The shared functional-core rotation (one rotation convention for
    # the whole repo — geometry.py header).
    return rotate_ccw(xy, th) + jnp.asarray([cx, cy])
