"""Pallas TPU kernels for frame preprocessing.

These are the hand-scheduled counterparts of the XLA-gather-based ops in
``ops.sampling`` — the hot preprocessing path called out in BASELINE.json
(letterbox resize, RGB↔YUV conversion, rotated-ROI sampling). The XLA
versions remain the default (they fuse into the surrounding program and are
already fast); the Pallas versions exist for explicit control of the
VMEM pipeline when preprocessing dominates, selected via
``use_pallas=True`` / ``ZARU_TPU_PALLAS=1``.

Design notes (see /opt/skills/guides/pallas_guide.md; all variants verified
bit-exact against the XLA sampler, compiled on TPU v5e):
- The letterbox sampler's geometry is fully static, so row selection is a
  static XLA row-gather feeding the kernel, and the column gather runs on
  the MXU as a static ONE-HOT MATMUL — v5e's `tpu.dynamic_gather` cannot
  cross 128-lane tiles, which rules out direct VPU gathers, and u8 rows
  cannot be loaded at dynamic sublane offsets. One-hot entries are exactly
  1.0 and u8 values are bf16-exact, so the MXU pass loses no bits.
- RGB↔YUV runs channel-planar so image width (not the 3-channel axis)
  carries the 128-lane dimension.
- The rotated general case keeps the XLA gather (data-dependent 2-D access
  has no good Mosaic lowering on this generation); on current shapes
  preprocessing is far from the bottleneck either way.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["letterbox_sample_pallas", "rgb_to_yuv", "yuv_to_rgb", "rgb_to_yuv_pallas"]


def _round_half_away_np(x):
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def letterbox_sample_pallas(
    image_u8,
    rect_cxcywh: np.ndarray,
    out_w: int,
    out_h: int,
    lo: float = -1.0,
    hi: float = 1.0,
    *,
    interpret: bool = False,
):
    """Axis-aligned letterbox sample + color map as a Pallas kernel.

    Equivalent to ``view_to_tensor`` for unrotated view rects whose
    geometry is known at trace time (the detector ingest path: full-frame
    letterbox). Returns ``[1, 3, out_h, out_w] float32``.

    The grid runs over output rows; the BlockSpec index_map selects the one
    source row each output row samples from (nearest neighbor), so only
    ``out_h`` rows of the source are ever DMA'd into VMEM.
    """
    H, W = int(image_u8.shape[0]), int(image_u8.shape[1])
    cx, cy, w, h = (float(v) for v in np.asarray(rect_cxcywh))
    left, top = cx - w / 2.0, cy - h / 2.0

    # Precompute the (static) nearest-neighbor source coordinates, exactly
    # mirroring the two-stage rounding of the reference sampler
    # (nn/mod.rs:54-73 + image/mod.rs:224-231).
    xv = _round_half_away_np(np.arange(out_w, dtype=np.float32) / out_w * np.float32(w))
    yv = _round_half_away_np(np.arange(out_h, dtype=np.float32) / out_h * np.float32(h))
    xs = _round_half_away_np(xv + 0.5 + np.float32(left) - 0.5)
    ys = _round_half_away_np(yv + 0.5 + np.float32(top) - 0.5)

    x_valid = (xs >= 0) & (xs < W)
    y_valid = (ys >= 0) & (ys < H)
    xs_c = np.clip(xs, 0, W - 1).astype(np.int32)
    ys_c = np.clip(ys, 0, H - 1).astype(np.int32)

    adjust = np.float32((hi - lo) / 255.0)
    lo_f = np.float32(lo)

    # All sampling geometry is static. Row selection happens OUTSIDE the
    # kernel as a static XLA row-gather (only out_h of H rows ever move).
    # The column gather runs on the MXU as a STATIC ONE-HOT MATMUL — the
    # canonical TPU formulation of a static gather, because the VPU's
    # tpu.dynamic_gather cannot cross 128-lane tiles. Exactness: the
    # one-hot entries are exactly 1.0 and u8 values (0..255) are exactly
    # representable even in bf16, so the MXU pass is bit-exact; the color
    # map then runs in f32 on the VPU, matching the XLA sampler bitwise.
    flat_rows = image_u8.reshape(H, W * 4)[jnp.asarray(ys_c)]  # [out_h, W*4]
    base = xs_c * 4  # flat offset of each output column's pixel
    onehot = np.zeros((W * 4, 3 * out_w), np.float32)
    for c in range(3):
        cols = np.arange(out_w)
        keep = x_valid  # OOB columns stay all-zero → sample 0 (black)
        onehot[base[keep] + c, c * out_w + cols[keep]] = 1.0
    sel = jnp.asarray(onehot)
    y_mask = jnp.asarray(y_valid.astype(np.float32).reshape(out_h, 1))

    def kernel(rows_ref, sel_ref, ymask_ref, out_ref):
        # u8 → f32 via i32 (Mosaic has no direct u8→f32 cast).
        rows = rows_ref[:].astype(jnp.int32).astype(jnp.float32)
        picked = jnp.dot(
            rows, sel_ref[:], preferred_element_type=jnp.float32
        )  # [out_h, 3*out_w]
        # OOB pixels read as black, whose color-mapped value is `lo`
        # (nn/mod.rs:129-168): rgb·mask·adjust + lo covers both cases.
        out_ref[:] = picked * ymask_ref[:] * adjust + lo_f

    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rows [out_h, W*4]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sel [W*4, 3*out_w]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # y mask [out_h, 1]
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_h, 3 * out_w), jnp.float32),
        interpret=interpret,
    )(flat_rows, sel, y_mask)
    # [out_h, 3, out_w] → [1, 3, out_h, out_w]
    return jnp.transpose(out.reshape(out_h, 3, out_w), (1, 0, 2))[None]


# ---------------------------------------------------------------------------
# RGB <-> YUV (BT.601), both as plain XLA and as a Pallas VPU kernel
# ---------------------------------------------------------------------------

_YUV_FROM_RGB = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ],
    np.float32,
)
_RGB_FROM_YUV = np.linalg.inv(_YUV_FROM_RGB).astype(np.float32)


def rgb_to_yuv(rgb):
    """BT.601 full-range RGB→YUV on float [..., 3] arrays in [0, 1]; U/V
    centered at 0."""
    m = jnp.asarray(_YUV_FROM_RGB)
    return rgb @ m.T


def yuv_to_rgb(yuv):
    m = jnp.asarray(_RGB_FROM_YUV)
    return yuv @ m.T


def rgb_to_yuv_pallas(rgb, *, interpret: bool = False, block_rows: int = 128):
    """RGB→YUV as a row-blocked Pallas VPU kernel.

    ``rgb``: float32 ``[H, W, 3]``. The kernel operates *planar*
    (``[3, H, W]``) so the 128-lane axis carries image width, not the
    3-channel axis (which Mosaic cannot tile); the interleave↔planar
    transposes fuse into neighbors under jit.
    """
    H, W = int(rgb.shape[0]), int(rgb.shape[1])
    m = _YUV_FROM_RGB
    planar = jnp.transpose(rgb, (2, 0, 1))  # [3, H, W]

    def kernel(in_ref, out_ref):
        x = in_ref[:]  # [3, block, W]
        r, g, b = x[0], x[1], x[2]
        out_ref[0] = m[0, 0] * r + m[0, 1] * g + m[0, 2] * b
        out_ref[1] = m[1, 0] * r + m[1, 1] * g + m[1, 2] * b
        out_ref[2] = m[2, 0] * r + m[2, 1] * g + m[2, 2] * b

    grid = (pl.cdiv(H, block_rows),)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, block_rows, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (3, block_rows, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, H, W), jnp.float32),
        interpret=interpret,
    )(planar)
    return jnp.transpose(out, (1, 2, 0))
