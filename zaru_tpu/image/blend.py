"""Blend/blit between image views
(reference: crates/zaru-image/src/blend.rs + blend.wgsl).

Copies a source view onto a destination view region with bilinear
filtering; source samples outside the source image are transparent zero
(blend.wgsl:25-34). Runs as one jitted device op over the destination
image (the reference's render pass → a masked dense map on TPU).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry import rrect_transform_in, rrect_transform_out

__all__ = ["blend", "blend_device", "bilinear_sample"]


def _srgb_to_linear(c):
    """sRGB EOTF on [0,1] values (color.rs:58-73)."""
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(l):
    return jnp.where(
        l <= 0.0031308, l * 12.92, 1.055 * jnp.maximum(l, 1e-12) ** (1 / 2.4) - 0.055
    )


def bilinear_sample(image_u8, pts):
    """Bilinearly samples ``image_u8 [H,W,4]`` at absolute pixel coords
    ``pts [...,2]`` (texel centers at i+0.5, GPU sampler convention).

    Filtering happens in *linear* light like the reference's sRGB texture
    views (image.rs:50-53: samples decode sRGB→linear before the GPU
    filter); alpha is linear already. Returns float32 linear-RGB + alpha in
    [0,1]; coordinates outside [0, W]×[0, H] return 0 (blend.wgsl's UV
    clamp-to-zero)."""
    H, W = image_u8.shape[0], image_u8.shape[1]
    x = pts[..., 0] - 0.5
    y = pts[..., 1] - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def tex(xi, yi):
        xi = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        texel = image_u8[yi, xi].astype(jnp.float32) / 255.0
        rgb = _srgb_to_linear(texel[..., :3])
        return jnp.concatenate([rgb, texel[..., 3:4]], axis=-1)

    c00 = tex(x0, y0)
    c10 = tex(x0 + 1, y0)
    c01 = tex(x0, y0 + 1)
    c11 = tex(x0 + 1, y0 + 1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    out = top * (1 - fy) + bot * fy

    u = pts[..., 0] / W
    v = pts[..., 1] / H
    inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
    return jnp.where(inside[..., None], out, 0.0)


def blend_device(dest_u8, dest_rrect, src_u8, src_rrect):
    """Pure device op: blits ``src_u8`` seen through ``src_rrect`` onto the
    ``dest_rrect`` region of ``dest_u8``. Returns the new dest array."""
    H, W = dest_u8.shape[0], dest_u8.shape[1]
    gx, gy = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32) + 0.5,
        jnp.arange(H, dtype=jnp.float32) + 0.5,
    )
    pts = jnp.stack([gx, gy], axis=-1)  # [H,W,2] dest-image pixel centers

    local = rrect_transform_in(dest_rrect, pts)  # dest-view coords
    dw, dh = dest_rrect[2], dest_rrect[3]
    inside = (
        (local[..., 0] >= 0)
        & (local[..., 0] <= dw)
        & (local[..., 1] >= 0)
        & (local[..., 1] <= dh)
    )

    # Normalized position in the dest view → the same position in the src
    # view → root coords of the src image (affine, like the GPU quad UVs).
    uv = local / jnp.stack([dw, dh])
    src_local = uv * jnp.stack([src_rrect[2], src_rrect[3]])
    src_pts = rrect_transform_out(src_rrect, src_local)

    sampled = bilinear_sample(src_u8, src_pts)  # linear light, [0,1]
    srgb = jnp.concatenate(
        [_linear_to_srgb(sampled[..., :3]), sampled[..., 3:4]], axis=-1
    )
    out = jnp.where(
        inside[..., None],
        jnp.clip(srgb * 255.0 + 0.5, 0, 255).astype(jnp.uint8),
        dest_u8,
    )
    return out


_blend_jit = jax.jit(blend_device)


def blend(dest, src):
    """Blends ``src`` (Image or ImageView) onto ``dest`` (Image or
    ImageView), returning a new :class:`Image` of the destination root
    (blend.rs:13-31). Use ``.view(rect)`` on either side to choose regions.
    """
    from . import Image, as_view

    dview = as_view(dest)
    sview = as_view(src)
    out = _blend_jit(
        dview.image.data,
        jnp.asarray(dview.view_rect.array),
        sview.image.data,
        jnp.asarray(sview.view_rect.array),
    )
    return Image(out)
