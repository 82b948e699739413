"""Pallas TPU kernels for frame preprocessing.

These are the hand-scheduled counterparts of the XLA-gather-based ops in
``ops.sampling`` — the hot preprocessing path called out in BASELINE.json
(letterbox resize, RGB↔YUV conversion, rotated-ROI sampling). The XLA
versions remain the default (they fuse into the surrounding program and are
already fast); the Pallas versions exist for explicit control of the
VMEM pipeline when preprocessing dominates, selected via
``use_pallas=True`` / ``ZARU_TPU_PALLAS=1``.

Design notes (see /opt/skills/guides/pallas_guide.md):
- A 1080p RGBA frame is ~8.3 MB — it does NOT fit VMEM comfortably next to
  other buffers, so kernels stream *rows* of the source through VMEM with
  the grid pipeline rather than loading whole frames.
- Nearest-neighbor sampling per output row touches one source row when the
  view is axis-aligned; the letterbox kernel exploits that: grid over
  output rows, each step DMAs exactly the source row it needs (computed
  via the BlockSpec index_map from the precomputed row mapping) and does a
  VPU gather along the row.
- The rotated general case keeps the XLA gather (data-dependent 2-D access
  defeats row streaming); on current shapes it is not the bottleneck.
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

    x_idx = jnp.asarray(xs_c)  # [out_w]
    x_mask = jnp.asarray(x_valid)
    y_mask = jnp.asarray(y_valid)
    row_map = jnp.asarray(ys_c)  # [out_h] source row per output row

    def kernel(row_map_ref, xidx_ref, xmask_ref, ymask_ref, src_row_ref, out_ref):
        i = pl.program_id(0)
        row = src_row_ref[0]  # [W, 4] uint8 — the needed source row
        cols = xidx_ref[:]  # [out_w]
        gathered = row[cols]  # [out_w, 4] VPU gather along the row
        rgb = gathered[:, :3].astype(jnp.float32)
        valid = (xmask_ref[:] & ymask_ref[i])[:, None]
        rgb = jnp.where(valid, rgb, 0.0)
        out_ref[0] = (rgb * adjust + lo_f).T  # [3, out_w]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # row_map, x_idx, x_mask, y_mask
        grid=(out_h,),
        in_specs=[
            # One source row per grid step, chosen by the prefetched map.
            pl.BlockSpec(
                (1, W, 4),
                lambda i, row_map, xidx, xmask, ymask: (row_map[i], 0, 0),
                memory_space=pl.ANY,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, out_w), lambda i, *prefetch: (i, 0, 0), memory_space=pl.ANY
        ),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_h, 3, out_w), jnp.float32),
        interpret=interpret,
    )(row_map, x_idx, x_mask, y_mask, image_u8)
    return jnp.transpose(out, (1, 0, 2))[None]  # [1, 3, out_h, out_w]


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

    ``rgb``: float32 ``[H, W, 3]``. Demonstrates the elementwise-kernel
    pattern: grid over row blocks, each block streamed HBM→VMEM→HBM.
    """
    H, W = int(rgb.shape[0]), int(rgb.shape[1])
    m = _YUV_FROM_RGB

    def kernel(in_ref, out_ref):
        x = in_ref[:]  # [block, W, 3]
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = m[0, 0] * r + m[0, 1] * g + m[0, 2] * b
        u = m[1, 0] * r + m[1, 1] * g + m[1, 2] * b
        v = m[2, 0] * r + m[2, 1] * g + m[2, 2] * b
        out_ref[:] = jnp.stack([y, u, v], axis=-1)

    grid = (pl.cdiv(H, block_rows),)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, W, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (block_rows, W, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((H, W, 3), jnp.float32),
        interpret=interpret,
    )(rgb)
