"""MXU-based rotated-ROI sampler — the serving-path fast lane.

The exact sampler (ops/sampling.py) expresses rotated-view sampling as an
XLA pointwise 2-D gather. On TPU that lowers to per-element accesses at
~13 ns/element: at batch 128 the 192x192 landmark crop costs ~61 ms/step —
87% of the whole fused-cascade step (see BENCHMARKS.md). This module
replaces it for the fused serving path with a formulation made of dense
TPU-native ops only (takes with small index vectors, one-hot MXU matmuls,
sublane mask-reductions), no pointwise gathers:

1. **Prescale** (XLA): the rotated view's axis-aligned bounding box is
   NN-resampled to a static planar intermediate ``[3, M, M]`` with two
   1-D row/column takes (index vectors of length M — cheap, unlike
   per-pixel index matrices; rows first for contiguous reads). OOB
   pixels become 0 like the exact sampler.
2. **Rotate** (Pallas): for each block of 16 output rows x (out_w /
   col_split) columns, DMA the [3, P, XW] band of the intermediate
   covering the block's source extent into VMEM (corner-derived dynamic
   offsets), select source *columns* with one fused int8 one-hot MXU
   matmul ``band[3P,XW] @ onehot[XW,lanes]`` (u8 re-biased via XOR 0x80;
   exact integer math at 2x the bf16 MXU rate) and source *rows* with a
   sublane mask-reduction — dense, exact selections throughout.

Accuracy: selection is exact; the approximation is in the index math —
the exact path's intermediate rounding (view-grid quantization +
prescale quantization) is collapsed into one affine map, so each output
pixel reads a source pixel within ~``max(1, bbox/M)`` px of the exact
path's choice. For typical ROIs (bbox <= M) that is <=1 source pixel, and
landmark outputs stay within the <=1 px parity budget (BASELINE.json);
tests/test_rotated_fast.py pins this against the exact sampler. Views
rotated beyond ``arcsin((P-8)/out_h / scale)`` (~38 deg at scale 1,
P=128) fall outside the banded window and read black — callers keep the
exact path when that matters (reference semantics: crates/zaru/src/
image/mod.rs:224-247 + nn/mod.rs:54-80).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rotated_sample_fast", "PRESCALE_M", "BAND_P", "WIN_X"]

PRESCALE_M = 512  # intermediate side; sampling is bit-exact for bbox <= M
BAND_P = 128      # band rows per 8-output-row block (rotation envelope)
WIN_X = 256       # band columns per block (x-window; no envelope, see below)
ROWS_PER_BLOCK = 8
PRESCALE_MARGIN = 2.0  # prescale bbox slack (matches the exact path)


def _rha(x):
    """round-half-away for the non-negative index range (floor(x+0.5));
    negatives differ only where the result is clipped/blacked anyway."""
    return jnp.floor(x + 0.5)


def _prescale_planar(image_u8, rrect, M: int):
    """NN-resample the rotated view's bounding box to planar [3, M, M] u8.

    Returns (planar, left, top, sx, sy): the sample grid is
    ``x(q) = rha(left + (q+0.5)*sx - 0.5)`` (and same for y), with OOB
    pixels zeroed (Color::NONE semantics, image/mod.rs:239-247).
    """
    H, W = image_u8.shape[0], image_u8.shape[1]
    cx, cy, w, h, th = (rrect[i] for i in range(5))
    c, s = jnp.abs(jnp.cos(th)), jnp.abs(jnp.sin(th))
    bw = w * c + h * s + PRESCALE_MARGIN
    bh = w * s + h * c + PRESCALE_MARGIN
    # INTEGER strides only: the "prescale" is a strided integer-offset
    # crop, so every intermediate pixel is a true image pixel on a
    # stride-sx grid. Views with bbox <= M get stride 1 (bit-exact
    # sampling); larger views subsample with index error <= ceil(sx/2)
    # (1 px up to bbox = 2M) — never interpolated/blended values.
    sx = jnp.ceil(jnp.maximum(bw / np.float32(M), 1.0))
    sy = jnp.ceil(jnp.maximum(bh / np.float32(M), 1.0))
    left = cx - sx * np.float32(M) * 0.5
    top = cy - sy * np.float32(M) * 0.5
    # Snap the window origin to the half-integer grid: with integer sx the
    # sample positions become xs(q) = floor(left+0.5) + sx*q exactly.
    left = jnp.floor(left + 0.5) - 0.5
    top = jnp.floor(top + 0.5) - 0.5

    q = jnp.arange(M, dtype=jnp.float32) + 0.5
    xs = _rha(left + q * sx - 0.5)
    ys = _rha(top + q * sy - 0.5)
    # OOB indices sample 0 (Color::NONE semantics). NB: the fill sentinel
    # must be >= size — jnp.take wraps NEGATIVE indices (numpy semantics)
    # before fill applies.
    xi = jnp.where((xs >= 0) & (xs < W), xs, np.float32(W)).astype(jnp.int32)
    yi = jnp.where((ys >= 0) & (ys < H), ys, np.float32(H)).astype(jnp.int32)
    # Rows FIRST: M dynamic-slices of CONTIGUOUS frame rows (7.7 KB each
    # at 1080p); column-first gathers at row-pitch stride measured ~2x
    # slower. The takes run on the frame bitcast to u32 (one RGBA pixel
    # per element): a u8[..., 4] column take scalarizes to per-byte
    # touches (~3.4 ms of the 14.8 ms prescale at batch 128) while the
    # u32 form gathers whole pixels and costs the same as the row take
    # alone (~11.4 ms total). Pure relayout — bit-identical, and the
    # OOB fill 0 is RGBA(0,0,0,0) in either form.
    image_u32 = lax.bitcast_convert_type(image_u8, jnp.uint32)  # [H, W]
    rows = jnp.take(image_u32, yi, axis=0, mode="fill", fill_value=0)
    patch32 = jnp.take(rows, xi, axis=1, mode="fill", fill_value=0)  # [M, M]
    patch = lax.bitcast_convert_type(patch32, jnp.uint8)  # [M, M, 4]
    planar = jnp.transpose(patch[..., :3], (2, 0, 1))  # [3, M, M]
    return planar, left, top, sx, sy


def _sampler_coefs(rrect, out_w: int, out_h: int, left, top, sx, sy):
    """Per-stream scalars for the kernel's index math.

    The kernel reproduces the exact path's TWO-stage rounding
    (ops/sampling._view_grid): xv = rha(j/out_w * W), pv = xv + 0.5 ->
    rrect_transform_out -> source = rha(root - 0.5) = floor(root), then
    maps into the prescale grid q = (root - 0.5 - left)/s - 0.5 (rounded
    once more by the kernel). At scale 1 with the snapped window origin
    this equals floor(root) - crop_offset — bit-exact.
    """
    cx, cy, w, h, th = (rrect[i] for i in range(5))
    cth, sth = jnp.cos(th), jnp.sin(th)
    # Scalars ordered to let the kernel replicate the exact path's f32
    # operation order (sampling._view_grid + geometry.rrect_transform_out):
    # px = (xv + 0.5) - w/2; root = (R@p + size/2) + top_left.
    return jnp.stack(
        [
            w,                         # 0
            h,                         # 1
            cth,                       # 2
            sth,                       # 3
            w * 0.5,                   # 4: half size
            h * 0.5,                   # 5
            cx - w * 0.5,              # 6: top-left
            cy - h * 0.5,              # 7
            (-0.5 - left) / sx - 0.5,  # 8: additive part of q = root/s + .
            (-0.5 - top) / sy - 0.5,   # 9
            1.0 / sx,                  # 10
            1.0 / sy,                  # 11
        ],
        axis=-1,
    ).astype(jnp.float32)


def _rotate_kernel(
    coef_ref, planar_ref, out_ref, band, sem, *, M, P, XW, out_w, out_h,
    cols, rows_pb, int8_mxu, hoist_band, rolled=False
):
    b = pl.program_id(0)
    blk = pl.program_id(1)
    cb = pl.program_id(2)
    lanes = rows_pb * cols

    w = coef_ref[b, 0]
    h = coef_ref[b, 1]
    cth = coef_ref[b, 2]
    sth = coef_ref[b, 3]
    whalf = coef_ref[b, 4]
    hhalf = coef_ref[b, 5]
    tlx = coef_ref[b, 6]
    tly = coef_ref[b, 7]
    qx0 = coef_ref[b, 8]
    qy0 = coef_ref[b, 9]
    inv_sx = coef_ref[b, 10]
    inv_sy = coef_ref[b, 11]

    def q_of(jf, kf, rounded: bool):
        """Index map replicating the exact path's f32 op order
        (sampling._view_grid + rrect_transform_out), then mapped into the
        prescale grid (one residual round happens in the caller)."""
        xv = (jf / np.float32(out_w)) * w
        yv = (kf / np.float32(out_h)) * h
        if rounded:
            xv = jnp.floor(xv + 0.5)
            yv = jnp.floor(yv + 0.5)
        px = (xv + 0.5) - whalf
        py = (yv + 0.5) - hhalf
        fx = (cth * px - sth * py + whalf) + tlx
        fy = (sth * px + cth * py + hhalf) + tly
        return fx * inv_sx + qx0, fy * inv_sy + qy0

    k0 = (blk * rows_pb).astype(jnp.float32)
    j0 = (cb * cols).astype(jnp.float32)
    if hoist_band and not rolled:
        # Full-band config (P == M, XW == M): the "window" is the whole
        # planar intermediate at static offset 0, delivered as a regular
        # VMEM block — Mosaic's pipeline copies it once per view and
        # reuses it across all (blk, cb) steps (the block index map is
        # b-only), eliminating the per-block re-DMA.
        start = xstart = 0
    else:
        # Window start: min x/y over the block's corners, with slack.
        # Dynamic sublane offsets must be 32-aligned (u8 tiling is
        # (32, 128)), so the y start rounds down, eating <= 31 rows of
        # the P-row envelope (both modes size P for it).
        corners = [
            q_of(j0 + jc, k0 + kc, rounded=False)
            for jc in (0.0, float(cols - 1))
            for kc in (0.0, float(rows_pb - 1))
        ]
        xmin = functools.reduce(jnp.minimum, [c[0] for c in corners])
        ymin = functools.reduce(jnp.minimum, [c[1] for c in corners])
        start = jnp.clip(jnp.floor(ymin).astype(jnp.int32) - 4, 0, M - P)
        start = pl.multiple_of((start // 32) * 32, 32)
        if rolled:
            # Rolled-window mode (full-band + square views): the planar
            # is VMEM-resident; x needs no DMA alignment because the
            # kernel ROLLS the lanes (below), so the window shrinks to
            # the coverage bound itself (~4x less one-hot contraction).
            xstart = jnp.clip(
                jnp.floor(xmin).astype(jnp.int32) - 4, 0, M - XW
            )
        else:
            # Banded config: per-block DMA; lane offsets must be
            # 128-aligned (the <=127-column loss is covered by the
            # x-window margin proof).
            xstart = jnp.clip(
                jnp.floor(xmin).astype(jnp.int32) - 3, 0, M - XW
            )
            xstart = pl.multiple_of((xstart // 128) * 128, 128)

            # One DMA for all three channel bands ([3, P, XW] copy).
            cp = pltpu.make_async_copy(
                planar_ref.at[b, :, pl.ds(start, P), pl.ds(xstart, XW)],
                band, sem,
            )
            cp.start()

    t = lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    jj = (t % cols).astype(jnp.float32) + j0
    kk = (t // cols).astype(jnp.float32) + k0
    qx, qy = q_of(jj, kk, rounded=True)
    xrel = jnp.floor(qx + 0.5).astype(jnp.int32) - xstart  # [1, lanes]
    yrel = jnp.floor(qy + 0.5).astype(jnp.int32) - start
    # Out-of-range columns/rows select nothing -> sample 0 (black), same
    # as the OOB rule; in-range selections are exact one-hots. (Window
    # starts are clamped to [0, M-size], so "in window" implies "inside
    # the intermediate" — OOB semantics are preserved exactly.)
    iota_x = lax.broadcasted_iota(jnp.int32, (XW, lanes), 0)
    iota_p = lax.broadcasted_iota(jnp.int32, (P, lanes), 0)
    my = (iota_p == yrel)                                   # [P, lanes]

    if hoist_band and rolled:
        # Window extraction from the resident planar: 32-aligned dynamic
        # y-slice, then a dynamic lane roll brings source column
        # ``xstart`` to lane 0 (roll shift M ≡ identity at xstart == 0).
        # Mosaic's dynamic rotate is 32-bit only, so bitcast packs 4 u8
        # sublanes per i32 element; columns roll as units, and the
        # round-trip makes the packing convention irrelevant.
        shift = M - xstart

        def win(ch):
            w8 = planar_ref[0, ch, pl.ds(start, P), :]   # [P, M] u8
            w32 = pltpu.bitcast(w8, jnp.int32)           # [P//4, M]
            w32 = pltpu.roll(w32, shift, axis=1)[:, :XW]
            return pltpu.bitcast(w32, jnp.uint8)         # [P, XW]

        band = jnp.stack([win(ch) for ch in range(3)])   # [3, P, XW]
    elif hoist_band:
        band = planar_ref[0]  # [3, M, M] for view b, resident in VMEM
    else:
        cp.wait()
        band = band[:]
    # The fused 3-channel matmul makes one [3P, lanes] selection
    # intermediate; fall back to a per-channel loop when that would
    # crowd VMEM (large full-band configs: P=M, col_split=1).
    fused3 = 3 * P * lanes * 4 <= 4 * 2**20
    if int8_mxu:
        # u8 pixels don't fit int8; XOR 0x80 re-biases to [-128, 127]
        # (u8 value - 128, exactly). The dot then yields
        # (pixel-128)·[x in window]; masking rows and adding back
        # 128·[x and y in window] reconstructs the exact pixel. All
        # integer arithmetic — bit-identical to the bf16 path, at 2x the
        # MXU rate.
        ohx = (iota_x == xrel).astype(jnp.int8)            # [XW, lanes]
        ind = ((xrel >= 0) & (xrel < XW) & (yrel >= 0) & (yrel < P))
        band_i8 = pltpu.bitcast(band ^ jnp.uint8(0x80), jnp.int8)
        my_i = my.astype(jnp.int32)
        if fused3:
            sel = jnp.dot(
                band_i8.reshape(3 * P, XW), ohx,
                preferred_element_type=jnp.int32,
            ).reshape(3, P, lanes)
            v = jnp.sum(sel * my_i[None], axis=1)          # [3, lanes]
        else:
            v = jnp.concatenate([
                jnp.sum(
                    jnp.dot(band_i8[ch], ohx,
                            preferred_element_type=jnp.int32) * my_i,
                    axis=0, keepdims=True,
                )
                for ch in range(3)
            ])
        out = (v + 128 * ind.astype(jnp.int32)).astype(jnp.float32)
    else:
        # bf16 MXU path: u8 values <= 255 < 2^8 are exact in bf16, and
        # one-hot selection is exact — same results as int8.
        ohx = (iota_x == xrel).astype(jnp.bfloat16)        # [XW, lanes]
        band_bf = band.astype(jnp.int32).astype(jnp.bfloat16)
        my_f = my.astype(jnp.float32)
        if fused3:
            sel = jnp.dot(
                band_bf.reshape(3 * P, XW), ohx,
                preferred_element_type=jnp.float32,
            ).reshape(3, P, lanes)
            out = jnp.sum(sel * my_f[None], axis=1)
        else:
            out = jnp.concatenate([
                jnp.sum(
                    jnp.dot(band_bf[ch], ohx,
                            preferred_element_type=jnp.float32) * my_f,
                    axis=0, keepdims=True,
                )
                for ch in range(3)
            ])
    out_ref[0, 0, 0, :, :] = out


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_w", "out_h", "lo", "hi", "interpret", "prescale_m", "band_p",
        "col_split", "win_x", "int8_mxu", "rows_per_block", "square_views",
    ),
)
def rotated_sample_fast(
    image_u8,
    rrect,
    out_w: int,
    out_h: int,
    lo: float = 0.0,
    hi: float = 1.0,
    *,
    interpret: bool = False,
    prescale_m: int | None = None,
    band_p: int | None = None,
    col_split: int | None = None,
    win_x: int | None = None,
    int8_mxu: bool = True,
    rows_per_block: int | None = None,
    square_views: bool = False,
):
    """Fast rotated-view sample + color map.

    ``image_u8``: ``[B, H, W, 4] u8``; ``rrect``: ``[B, ..., 5] f32`` —
    extra middle dims (e.g. tracker slots ``[B, S, 5]``) sample multiple
    views per frame without duplicating the frame. Returns
    ``[B, ..., out_h, out_w, 3] f32`` (NHWC — feed NHWC-internal models
    transpose-free via ``ImportedModel.apply_nhwc``).

    Geometry knobs (static):

    - ``prescale_m``: intermediate side M. Sampling is bit-exact for view
      bboxes <= M and subsamples on an integer-stride grid beyond
      (index error <= ceil(stride/2)).
    - ``band_p``: rows of the intermediate DMA'd per block. The rotation
      envelope is ``sin|theta| * (view_size/stride) * (cols/out_w)
      <= band_p - ~50``; ``band_p == prescale_m`` disables banding and
      supports ARBITRARY rotation (cost grows linearly with band_p).
    - ``col_split``: split each row block into this many column blocks —
      narrower blocks shrink both the per-block row drift (wider rotation
      envelope) and the source-x span (enabling the x-window), at the
      price of more per-block overhead. Default: auto — the smallest
      divisor of ``out_w`` whose blocks the x-window provably covers.
    - ``win_x``: columns of the intermediate DMA'd per block (the one-hot
      contraction width — the kernel's FLOP knob). Auto-disabled (full
      ``M``) whenever the margin-based coverage proof doesn't hold for
      this (M, out_w, col_split), so it never changes results.
    - ``int8_mxu``: run the one-hot contraction on the MXU in int8 (2x
      bf16 rate). Exact integer math — results are bit-identical to the
      bf16 path; switch off only if a backend lacks int8 matmul.
    - ``rows_per_block``: override the output rows per kernel block.
    - ``square_views``: caller promise that every view rect has w == h
      (true for all cascade ROIs — CNN inputs are square and
      ``aspect_view_rect`` fits them). Enables the ROLLED-WINDOW mode for
      full-band configs: a dynamic lane roll replaces DMA alignment so
      the per-block window shrinks to 128 columns (≈4x less one-hot
      contraction work) while keeping ANY-rotation coverage. Results are
      identical for square views; non-square views may read black.
    """
    assert rrect.shape[0] == image_u8.shape[0] and rrect.shape[-1] == 5
    # Mosaic is TPU-only; on CPU (unit tests, virtual meshes) the kernel
    # runs in interpreter mode, which jit compiles to plain XLA.
    interpret = interpret or jax.default_backend() != "tpu"
    M = prescale_m or PRESCALE_M
    P = min(band_p or BAND_P, M)
    XW = min(win_x or WIN_X, M)

    # Rolled-window mode for full-band configs (see _rotate_kernel): with
    # SQUARE views (w == h ⇒ sx == sy, e.g. every cascade ROI — all CNN
    # inputs are square and aspect_view_rect fits them) a block's source
    # span in EITHER axis is ≤ (M - margin)·(cols + rows_pb)/out_w at any
    # rotation: from the prescale bbox constraints w·c + h·s ≤ (M-m)·s
    # and w·s + h·c ≤ (M-m)·s (sx == sy == s), each of c·w/s, s·w/s,
    # c·h/s, s·h/s is ≤ M-m. A dynamic lane roll replaces the 128-lane
    # DMA alignment, so the window shrinks to 128 columns and the one-hot
    # contraction drops ~4x. Non-square views may read black — callers
    # opt in via ``square_views``. NB: rolled mode picks its own blocking
    # (col_split and, unless ``rows_per_block`` is given, rows per block)
    # — the caller's full-band ``col_split`` marker is deliberately
    # overridden. It needs M >= 128 (the fixed window width); smaller
    # intermediates fall back to the plain full-band kernel.
    rolled = False
    if square_views and P == M and XW == M and out_w == out_h and M >= 128:
        rpb_choices = [rows_per_block] if rows_per_block else [32, 16, 8]
        for cs in (c for c in range(1, 33) if out_w % c == 0):
            hit = False
            for rpb in rpb_choices:
                if out_h % rpb:
                    continue
                # Conservative span bound (the sum is looser than the
                # true per-axis max — keep it; the margin also covers
                # index-rounding wiggle, via the +10).
                span = int(
                    np.ceil(
                        (M - PRESCALE_MARGIN)
                        * (out_w // cs + rpb)
                        / out_w
                    )
                ) + 10  # index-rounding wiggle + window back-off slack
                if span > 128:
                    continue
                # +31: the y-start rounds DOWN to a 32-sublane multiple
                # in the kernel, eating up to 31 window rows; the x roll
                # needs no such allowance (unaligned).
                p_r = min(-(-(span + 31) // 32) * 32, M)
                col_split, rows_pb, P, XW = cs, rpb, p_r, 128
                rolled = hit = True
                break
            if hit:
                break

    # x-window coverage: a block's source-x span in prescale units is
    #   cols*cos*(w/sx)/out_w + rows*sin*(h/sy)/out_h
    # maximized (LP over w,h >= 0 under the prescale bbox constraints
    # w*cos + h*sin <= (M-margin)*sx and w*sin + h*cos <= (M-margin)*sy)
    # at (M-margin)*cols/out_w — independent of rotation. The usable
    # window past a block's xmin is XW - 128 (128-alignment + floor), and
    # index rounding adds <= ~2.5 px of wiggle per side (two-stage
    # round-half-away, |c|+|s| <= sqrt(2)) plus up to ~2 px of additional
    # margin error at stride > 1; 10 px of slack covers both with room.
    def covered(cs):
        return XW - 128 >= (M - PRESCALE_MARGIN) / cs + 10

    if not rolled:
        if col_split is None:
            # Auto: the smallest divisor of out_w whose blocks the
            # x-window provably covers (smaller splits = fewer, bigger
            # blocks = less per-block overhead; span shrinks ∝
            # 1/col_split).
            col_split = next(
                (c for c in range(4, 17) if out_w % c == 0 and covered(c)),
                4 if out_w % 4 == 0 else 1,
            )
        # Never silently clip: without a coverage proof, disable the
        # window.
        if not covered(col_split):
            XW = M
        # Rows per block: bigger blocks amortize per-block overhead (the
        # measured kernel limiter), capped so wide blocks (full-band
        # configs with col_split=1) keep their selection intermediates
        # VMEM-friendly. ``rows_per_block`` overrides (bounded by what
        # VMEM actually fits — Mosaic errors loudly if it doesn't).
        rows_pb = rows_per_block or (
            16
            if out_h % 16 == 0 and 16 * (out_w // col_split) <= 2048
            else ROWS_PER_BLOCK
        )
    assert out_w % col_split == 0
    assert out_h % rows_pb == 0
    B = image_u8.shape[0]
    slot_dims = rrect.shape[1:-1]
    rrect_flat = rrect.reshape(B, -1, 5)
    cols = out_w // col_split
    lanes = rows_pb * cols
    n_blocks = out_h // rows_pb

    def one(img, rr):
        planar, left, top, sx, sy = _prescale_planar(img, rr, M)
        coefs = _sampler_coefs(rr, out_w, out_h, left, top, sx, sy)
        return planar, coefs

    # Inner vmap over slots shares the frame (batched gather indices, no
    # frame duplication); outer vmap over streams.
    planar, coefs = jax.vmap(jax.vmap(one, in_axes=(None, 0)))(
        image_u8, rrect_flat
    )
    N = B * rrect_flat.shape[1]
    planar = planar.reshape(N, 3, M, M)
    coefs = coefs.reshape(N, coefs.shape[-1])

    # Full-band configs (P == M and XW == M) read the ENTIRE per-view
    # planar with static offsets, so the window can be a regular VMEM
    # block whose index map depends only on the view: Mosaic copies it
    # once per view and reuses it across all (blk, cb) grid steps, instead
    # of re-issuing the [3, P, XW] DMA per block.
    hoist_band = rolled or (P == M and XW == M)
    kernel = functools.partial(
        _rotate_kernel, M=M, P=P, XW=XW, out_w=out_w, out_h=out_h,
        cols=cols, rows_pb=rows_pb, int8_mxu=int8_mxu,
        hoist_band=hoist_band, rolled=rolled,
    )
    if hoist_band:
        kern = lambda coef_ref, planar_ref, out_ref: kernel(
            coef_ref, planar_ref, out_ref, None, None
        )
        planar_spec = pl.BlockSpec(
            (1, 3, M, M), lambda b, blk, cb: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        scratch = []
    else:
        kern = kernel
        planar_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((3, P, XW), jnp.uint8),
            pltpu.SemaphoreType.DMA(()),
        ]
    out = pl.pallas_call(
        kern,
        grid=(N, n_blocks, col_split),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coefs [N, 12]
            planar_spec,  # planar [N, 3, M, M]
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, 3, lanes), lambda b, blk, cb: (b, blk, cb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (N, n_blocks, col_split, 3, lanes), jnp.float32
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(coefs, planar)

    adjust = np.float32((hi - lo) / 255.0)
    out = out * adjust + np.float32(lo)
    # [N, nrb, cs, 3, rows_pb*cols] -> [B, ..., out_h, out_w, 3]
    out = out.reshape(N, n_blocks, col_split, 3, rows_pb, cols)
    out = jnp.transpose(out, (0, 1, 4, 2, 5, 3)).reshape(N, out_h, out_w, 3)
    return out.reshape((B, *slot_dims, out_h, out_w, 3))
