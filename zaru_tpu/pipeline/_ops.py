"""Shared traced building blocks for the fused pipelines.

One source of truth for the coordinate math used by both the single-object
cascade (face_cascade.py) and the fixed-slot multi-object tracker
(multi_object.py): full-frame letterbox fitting, network→image unmapping
(detection.rs:245-267), and the view→image landmark/ROI update
(landmark.rs:463-501).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..geometry import (
    rect_grow_rel,
    rect_grow_to_fit_aspect,
    rrect_bounding,
    rrect_transform_out,
)

__all__ = [
    "full_frame_fit",
    "unmap_center_size",
    "unmap_points",
    "aspect_view_rect",
    "landmarks_to_image",
    "padded_roi",
]


def full_frame_fit(frame, res):
    """Letterbox rect covering the whole frame at the network's aspect
    (detection.rs:224-226). Returns (fit rect [4], fit rrect [5])."""
    h, w = frame.shape[0], frame.shape[1]
    aspect = np.float32(res.width) / np.float32(res.height)
    fit = rect_grow_to_fit_aspect(
        jnp.asarray([w / 2.0, h / 2.0, float(w), float(h)], jnp.float32), aspect
    )
    return fit, jnp.concatenate([fit, jnp.zeros(1, jnp.float32)])


def unmap_center_size(box, fit, res):
    """Network-input coords → image coords for a (cx,cy,w,h) box
    (detection.rs:245-267). Broadcasts over leading dims."""
    scale = fit[2] / np.float32(res.width)
    top_left = fit[0:2] - fit[2:4] * 0.5
    center = box[..., 0:2] * scale + top_left
    size = box[..., 2:4] * scale
    return jnp.concatenate([center, size], axis=-1)


def unmap_points(xy, fit, res):
    """Network-input coords → image coords for points ``[..., 2]``
    (same mapping as :func:`unmap_center_size`'s center)."""
    scale = fit[2] / np.float32(res.width)
    top_left = fit[0:2] - fit[2:4] * 0.5
    return xy * scale + top_left


def aspect_view_rect(roi, res):
    """ROI grown to the landmark network's aspect, rotation kept
    (landmark.rs:465)."""
    aspect = np.float32(res.width) / np.float32(res.height)
    return jnp.concatenate([rect_grow_to_fit_aspect(roi[0:4], aspect), roi[4:5]])


def landmarks_to_image(coords, view_rect, res):
    """Network coords → (xy in view coords, positions [N,3] in image coords)
    (landmark.rs:336-345, 482-487)."""
    scale = view_rect[2] / np.float32(res.width)
    xy_view = coords[:, 0:2] * scale
    z = coords[:, 2:3] * scale
    xy = rrect_transform_out(view_rect, xy_view)
    return xy_view, jnp.concatenate([xy, z], axis=-1)


def padded_roi(xy, angle, padding):
    """Next ROI: rotated bounding box of the landmarks + relative padding
    (landmark.rs:488-494)."""
    roi = rrect_bounding(angle, xy)
    return jnp.concatenate([rect_grow_rel(roi[0:4], padding), roi[4:5]])
