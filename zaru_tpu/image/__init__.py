"""Device-resident images and rotated-rect views.

TPU-native counterpart of reference crates/zaru-image (GPU `Image` on wgpu
textures) and crates/zaru/src/image/mod.rs (CPU `Image` + views). An
:class:`Image` is an RGBA uint8 ``[H, W, 4]`` array living in device HBM;
views are *lazy* — an :class:`ImageView` is just the image plus a rotated
rect in root coordinates (view.rs:44-47), composed like the reference
(image/mod.rs:201-210), and only materialized by the fused sampling gather.
"""

from __future__ import annotations

from pathlib import Path
from typing import Protocol, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..color import Color
from ..geometry import Rect, RotatedRect, rrect_compose
from ..ops.sampling import sample_view
from ..resolution import AspectRatio, Resolution
from . import decode as _decode

# Shared across every ImageView.to_image call so repeated
# materializations at one output size reuse the compiled program.
_sample_view_jit = jax.jit(sample_view, static_argnames=("out_w", "out_h"))

__all__ = ["Image", "ImageView", "AsImageView", "as_view"]

RectLike = Union[Rect, RotatedRect]


def _to_rrect(rect: RectLike) -> RotatedRect:
    if isinstance(rect, Rect):
        return RotatedRect.from_rect(rect)
    return rect


class Image:
    """An RGBA8 image stored as a ``[H, W, 4] uint8`` device array
    (reference zaru-image/src/image.rs:11-20; CPU analog image/mod.rs:47)."""

    def __init__(self, data):
        data = jnp.asarray(data, dtype=jnp.uint8)
        assert data.ndim == 3 and data.shape[2] == 4, data.shape
        self._data = data

    # --- constructors -------------------------------------------------------
    @staticmethod
    def new(width: int, height: int) -> "Image":
        """A transparent black image (image.rs:78-88)."""
        return Image(jnp.zeros((height, width, 4), jnp.uint8))

    @staticmethod
    def filled(width: int, height: int, color: Color) -> "Image":
        px = jnp.asarray(color.as_array())
        return Image(jnp.broadcast_to(px, (height, width, 4)))

    @staticmethod
    def from_rgba8(width: int, height: int, buf) -> "Image":
        arr = np.frombuffer(bytes(buf), np.uint8).reshape(height, width, 4)
        return Image(arr)

    @staticmethod
    def from_rgb8(width: int, height: int, buf) -> "Image":
        rgb = np.frombuffer(bytes(buf), np.uint8).reshape(height, width, 3)
        return Image(np.concatenate([rgb, np.full_like(rgb[..., :1], 255)], -1))

    @staticmethod
    def from_array(arr) -> "Image":
        """From an ``[H, W, 3|4] uint8`` array."""
        arr = np.asarray(arr)
        if arr.shape[-1] == 3:
            arr = np.concatenate([arr, np.full_like(arr[..., :1], 255)], -1)
        return Image(arr)

    @staticmethod
    def load(path: str | Path) -> "Image":
        """Decodes a JPEG/PNG/GIF/... file (decode.rs:29-75)."""
        return Image.from_array(_decode.load_image(path))

    @staticmethod
    def decode_jpeg(data: bytes) -> "Image":
        return Image.from_array(_decode.decode_jpeg(data))

    # --- accessors ----------------------------------------------------------
    @property
    def data(self) -> jnp.ndarray:
        """The underlying ``[H, W, 4] uint8`` device array."""
        return self._data

    def width(self) -> int:
        return self._data.shape[1]

    def height(self) -> int:
        return self._data.shape[0]

    def resolution(self) -> Resolution:
        return Resolution(self.width(), self.height())

    def rect(self) -> Rect:
        return Rect.from_top_left(0.0, 0.0, float(self.width()), float(self.height()))

    def aspect_ratio(self) -> AspectRatio | None:
        return self.resolution().aspect_ratio()

    def to_numpy(self) -> np.ndarray:
        """CPU readback (reference image.rs:185-230 ``with_data``)."""
        return np.asarray(self._data)

    def get(self, x: int, y: int) -> Color:
        r, g, b, a = (int(v) for v in self.to_numpy()[y, x])
        return Color(r, g, b, a)

    def set(self, x: int, y: int, color: Color) -> None:
        """Sets one pixel (host-side; re-uploads — for debug/draw use)."""
        # Device readback is a read-only view; copy before mutating.
        arr = np.array(self.to_numpy(), copy=True)
        arr[y, x] = color.as_array()
        self._data = jnp.asarray(arr)

    # --- views --------------------------------------------------------------
    def as_view(self) -> "ImageView":
        return ImageView(self, RotatedRect.from_rect(self.rect()))

    def view(self, rect: RectLike) -> "ImageView":
        return self.as_view().view(rect)

    def __repr__(self) -> str:
        return f"{self.width()}x{self.height()} Image"


class ImageView:
    """An immutable rotated-rect view of an :class:`Image`
    (reference image/mod.rs:252-331, zaru-image/src/view.rs:44-123).

    ``rect`` is stored in *root image* coordinates; nested views compose by
    adding rotations and mapping centers through the parent's transform.
    """

    def __init__(self, image: Image, data_rect: RotatedRect):
        self._image = image
        self._rect = data_rect  # root-image coordinates

    @property
    def image(self) -> Image:
        return self._image

    @property
    def view_rect(self) -> RotatedRect:
        """The view's rotated rect in root-image coordinates."""
        return self._rect

    def rect(self) -> Rect:
        """A rect of this view's size positioned at (0,0)
        (image/mod.rs:211-214)."""
        r = self._rect.rect()
        return Rect.from_top_left(0.0, 0.0, r.width(), r.height())

    def width(self) -> float:
        return self._rect.rect().width()

    def height(self) -> float:
        return self._rect.rect().height()

    def as_view(self) -> "ImageView":
        return self

    def view(self, rect: RectLike) -> "ImageView":
        """Creates a sub-view; composition per image/mod.rs:201-210."""
        sub = _to_rrect(rect)
        composed = rrect_compose(
            self._rect.array.astype(np.float32), sub.array.astype(np.float32)
        )
        return ImageView(self._image, RotatedRect(np.asarray(composed)))

    def to_image(self) -> Image:
        """Materializes the view (size rounded up; image/mod.rs:318-331)."""
        w = int(np.ceil(self.width()))
        h = int(np.ceil(self.height()))
        # Module-level jit: a fresh jax.jit wrapper per call would defeat
        # the trace cache and pay a compile per materialization.
        return Image(_sample_view_jit(
            self._image.data, jnp.asarray(self._rect.array), out_w=w, out_h=h
        ))

    def get(self, x: int, y: int) -> Color:
        """Single-pixel view read (test/debug; image/mod.rs:296-303).

        Samples a 1×1 sub-view so the rotated-view pixel semantics are
        identical to full materialization.
        """
        from ..ops.sampling import sample_view_rgba

        sub = self.view(Rect.from_top_left(float(x), float(y), 1.0, 1.0))
        one = sample_view_rgba(
            self._image.data,
            jnp.asarray(sub._rect.array),
            1,
            1,
            scale_to_view=False,
        )
        r, g, b, a = (int(v) for v in np.asarray(one[0, 0]))
        return Color(r, g, b, a)

    def __repr__(self) -> str:
        return f"ImageView @ {self._rect!r}"


class AsImageView(Protocol):
    def as_view(self) -> ImageView: ...


def as_view(obj) -> ImageView:
    if isinstance(obj, ImageView):
        return obj
    return obj.as_view()
