"""Rotated-ROI nearest-neighbor sampling — the image→tensor hot path.

This single fused gather replaces the reference's *hottest CPU loop*: the
per-pixel `Cnn::image_map` closure (reference crates/zaru/src/nn/mod.rs:54-80)
composed with `ImageView` rotated-rect pixel lookup
(crates/zaru/src/image/mod.rs:224-247). The semantics are reproduced exactly
so landmarks stay within 1px of the reference:

For a network input of size (w, h) sampling a view rect (W, H, θ) whose
coordinates live in a root image:

1. ``u = x_in / w``, ``v = y_in / h`` (note: *not* pixel centers), then
   ``x_view = round(u·W)``, ``y_view = round(v·H)`` with round-half-away
   (nn/mod.rs:54-58 — Rust ``f32::round`` + ``as u32`` cast).
2. view pixel centers map to root coords through the rotated rect:
   ``p_root = transform_out([x_view+0.5, y_view+0.5])``, then
   ``x = round(p_root.x − 0.5)`` (image/mod.rs:224-231).
3. out-of-bounds reads are ``Color::NONE`` = rgba(0,0,0,0)
   (image/mod.rs:239-247), which the linear color mapper then maps like a
   black pixel.
4. the color map is ``c · (hi−lo)/255 + lo`` on non-linear sRGB bytes
   (nn/mod.rs:129-168).

Everything is a fixed-shape gather: it vmaps over batch dims (multi-stream /
multi-ROI) and runs inside one jitted cascade program so the detect→crop→
landmark loop never leaves the chip.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry import rrect_transform_out
from ..num import round_half_away as _round_half_away

__all__ = [
    "sample_view",
    "sample_view_rgba",
    "view_to_tensor",
    "view_to_tensor_core",
    "letterbox_sample_core",
]


def _view_grid(rrect, out_w: int, out_h: int, scale_to_view: bool):
    """Root-image integer pixel coords + validity prerequisites for each
    output pixel of a rotated view sampled at (out_w, out_h)."""
    if scale_to_view:
        # CNN input sampling: x_view = round(x/w * W_view) as u32.
        u = jnp.arange(out_w, dtype=jnp.float32) / np.float32(out_w)
        v = jnp.arange(out_h, dtype=jnp.float32) / np.float32(out_h)
        xv = _round_half_away(u * rrect[2])
        yv = _round_half_away(v * rrect[3])
    else:
        # Direct view materialization (ImageView::to_image): integer coords.
        xv = jnp.arange(out_w, dtype=jnp.float32)
        yv = jnp.arange(out_h, dtype=jnp.float32)

    # Pixel-center mapping through the rotated rect (image/mod.rs:224-231).
    gx, gy = jnp.meshgrid(xv + 0.5, yv + 0.5)  # [out_h, out_w]
    pts = jnp.stack([gx, gy], axis=-1)
    root = rrect_transform_out(rrect, pts)
    xr = _round_half_away(root[..., 0] - 0.5)
    yr = _round_half_away(root[..., 1] - 0.5)
    return xr, yr


def sample_view_rgba(image_u8, rrect, out_w: int, out_h: int, *, scale_to_view=True):
    """Gathers an RGBA uint8 ``[out_h, out_w, 4]`` block from a rotated view.

    ``image_u8``: root image ``[H, W, 4] uint8``. ``rrect``: view rotated
    rect ``[5] f32`` in root coords. OOB pixels are (0,0,0,0).
    """
    H, W = image_u8.shape[0], image_u8.shape[1]
    xr, yr = _view_grid(rrect, out_w, out_h, scale_to_view)
    valid = (xr >= 0) & (yr >= 0) & (xr < W) & (yr < H)
    xi = jnp.clip(xr.astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(yr.astype(jnp.int32), 0, H - 1)
    gathered = image_u8[yi, xi]  # [out_h, out_w, 4]
    return jnp.where(valid[..., None], gathered, jnp.zeros_like(gathered))


def view_to_tensor_core(
    image_u8,
    rrect,
    out_w: int,
    out_h: int,
    lo: float = -1.0,
    hi: float = 1.0,
    layout: str = "NCHW",
):
    """Traceable core of the fused rotated-ROI sample + letterbox + linear
    color map → CNN input. The single source of truth used both by the
    jitted standalone op below and by ``Cnn.apply_on_view`` inside fused
    pipelines — keep one copy so what's parity-tested is what runs.

    Returns ``[1, 3, out_h, out_w]`` (NCHW) or ``[1, out_h, out_w, 3]``
    (NHWC) float32. Matches ``Cnn::estimate``'s tensor construction
    (nn/mod.rs:54-80) bit-closely.
    """
    rgba = sample_view_rgba(image_u8, rrect, out_w, out_h)
    rgb = rgba[..., :3].astype(jnp.float32)
    adjust = (hi - lo) / np.float32(255.0)
    mapped = rgb * adjust + lo
    if layout == "NCHW":
        return jnp.transpose(mapped, (2, 0, 1))[None]
    return mapped[None]


view_to_tensor = partial(jax.jit, static_argnames=("out_w", "out_h", "layout"))(
    view_to_tensor_core
)


def letterbox_sample_core(image_u8, rrect, out_w: int, out_h: int, lo, hi):
    """Exact axis-aligned (angle-0) view sample + color map via two 1-D
    index-vector takes.

    For an unrotated view the sampler grid of ``view_to_tensor_core`` is
    separable (``rotate_ccw`` at θ=0 is exact in f32: cos=1, sin=0), so two
    takes reproduce its NHWC output **bit-exactly at any view scale** — no
    prescale stride quantization — while staying in the fast index-vector
    gather regime (the XLA pointwise 2-D gather costs ~13 ns/element on
    TPU). This is the detection fast path: full-frame letterbox fit rects
    (``full_frame_fit``, detection.rs:224-226) always have angle 0.

    Returns ``[out_h, out_w, 3] f32`` (NHWC, color-mapped).
    """
    H, W = image_u8.shape[0], image_u8.shape[1]
    u = jnp.arange(out_w, dtype=jnp.float32) / np.float32(out_w)
    v = jnp.arange(out_h, dtype=jnp.float32) / np.float32(out_h)
    xv = _round_half_away(u * rrect[2])
    yv = _round_half_away(v * rrect[3])
    # transform_out at θ=0, replicating rrect_transform_out's f32 op order
    # exactly: ((pt - center) + center) + top_left.
    wc = rrect[2] * 0.5
    hc = rrect[3] * 0.5
    fx = ((xv + 0.5) - wc) + wc + (rrect[0] - wc)
    fy = ((yv + 0.5) - hc) + hc + (rrect[1] - hc)
    xr = _round_half_away(fx - 0.5)
    yr = _round_half_away(fy - 0.5)
    # OOB → fill 0 (Color::NONE). Sentinel must be >= size: jnp.take wraps
    # negative indices (numpy semantics) before fill applies. The takes
    # run on the frame bitcast to u32 (one RGBA pixel per element): u8
    # column takes scalarize to per-byte touches on TPU while u32 takes
    # gather whole pixels (~2x; same trick as ops/rotated_fast's
    # prescale). Pure relayout — bit-identical, OOB fill 0 included.
    xi = jnp.where((xr >= 0) & (xr < W), xr, np.float32(W)).astype(jnp.int32)
    yi = jnp.where((yr >= 0) & (yr < H), yr, np.float32(H)).astype(jnp.int32)
    image_u32 = jax.lax.bitcast_convert_type(image_u8, jnp.uint32)  # [H, W]
    rows = jnp.take(image_u32, yi, axis=0, mode="fill", fill_value=0)
    patch32 = jnp.take(rows, xi, axis=1, mode="fill", fill_value=0)
    patch = jax.lax.bitcast_convert_type(patch32, jnp.uint8)  # [h, w, 4]
    rgb = patch[..., :3].astype(jnp.float32)
    adjust = (hi - lo) / np.float32(255.0)
    return rgb * adjust + np.float32(lo)


def sample_view(image_u8, rrect, out_w: int, out_h: int):
    """Materializes a rotated view as a new RGBA image (``ImageView::
    to_image``, image/mod.rs:318-331)."""
    return sample_view_rgba(image_u8, rrect, out_w, out_h, scale_to_view=False)
