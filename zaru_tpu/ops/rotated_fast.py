"""MXU-based rotated-ROI sampler — the serving-path fast lane.

The exact sampler (ops/sampling.py) expresses rotated-view sampling as an
XLA pointwise 2-D gather. On TPU that lowers to per-element accesses at
~13 ns/element: at batch 128 the 192x192 landmark crop costs ~61 ms/step —
87% of the whole fused-cascade step (see BENCHMARKS.md). This module
replaces it for the fused serving path with a formulation made of dense
TPU-native ops only (DMA'd crops, one-hot MXU matmuls, sublane
mask-reductions), no pointwise gathers:

1. **Prescale**: the rotated view's axis-aligned bounding box is
   NN-resampled to a static u32 intermediate ``[M, M]`` (one RGBA pixel
   per element) on an integer-stride grid. Two implementations selected
   by a batch-scalar ``lax.cond``:

   - a Pallas kernel (the fast lane): the bbox-covering frame window is
     DMA'd ONCE per view into VMEM, then rows and columns are selected
     with blocked one-hot int8 MXU matmuls (round 2's XLA index-vector
     ``take`` implementation was gather-overhead-bound: its row take
     alone cost ~8.6 ms of the ~21 ms cascade step at batch 128). Three
     static crop classes are compiled (stride bounds 1 / 2 / 3; the
     tightest admissible class runs) so small views pay small crop DMAs
     and rotation-inflated bboxes stay on the fast lane;
   - the original XLA take path as exact fallback for views no crop
     class covers (stride > 3, bbox beyond the crop size, frames
     narrower than the aligned crop).

   OOB pixels become 0 like the exact sampler, and both paths are
   index-for-index identical (integer source indices on the same grid).
2. **Rotate** (Pallas): for each block of output rows x (out_w /
   col_split) columns, obtain the [P, XW] u32 window of the intermediate
   covering the block's source extent (per-block DMA, resident full-band
   reuse, or a dynamic lane roll — see the mode notes below), unpack the
   3 channels with VPU shifts, select source *columns* with one fused
   int8 one-hot MXU matmul ``band[3P,XW] @ onehot[XW,lanes]`` (values
   re-biased by -128; exact integer math at 2x the bf16 MXU rate) and
   source *rows* with a sublane mask-reduction — dense, exact selections
   throughout.

Accuracy: selection is exact; the approximation is in the index math —
the exact path's intermediate rounding (view-grid quantization +
prescale quantization) is collapsed into one affine map, so each output
pixel reads a source pixel within ~``max(1, bbox/M)`` px of the exact
path's choice. For typical ROIs (bbox <= M) that is <=1 source pixel, and
landmark outputs stay within the <=1 px parity budget (BASELINE.json);
tests/test_rotated_fast.py pins this against the exact sampler.

Rotation coverage: the auto-selected banded configuration prefers a
column split whose per-block y-band provably covers ANY view rotation
(see ``any_rotation`` in the config chooser) — e.g. col_split=6 at
M=512/out 192 (the face serving shape). Manually forced configs outside
that proof fall back to a limited envelope (blocks beyond it read
black); the full-band / rolled-window configurations always cover the
full circle (reference semantics: crates/zaru/src/image/mod.rs:224-247 +
nn/mod.rs:54-80).
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

# Pallas-prescale blocking: RQ x CQ output chunks selected per matmul pair
# from a per-view VMEM-resident frame crop. Three static crop classes
# are compiled, bounded at stride 1, 2, and 3 (the XLA take path covers
# the rest via nested batch-scalar conds); a row chunk reads
# <= smax*(RQ-1)+1 source rows (+7 sublane alignment) and a column chunk
# <= smax*(CQ-1)+1 source columns (+127 lane alignment). The tightest
# admissible class runs (smallest crop DMA + selection matmuls): the
# stride-1 class covers bbox <= M bit-exactly with a ~3x smaller crop
# than stride 2; the stride-3 class keeps tilted large views off the
# slow take fallback — a view's axis-aligned bbox inflates by
# (cos+sin) <= sqrt(2) under rotation, so e.g. the 836 px face ROI is
# stride 2 upright but stride 3 at 45-ish degrees (round-3 tilt cliff:
# 8.4 -> 12.9 ms/step, TODO_NEXT #1/#8; the stride-3 class brings it
# back to ~8.2).
PRESCALE_RQ = 64     # output rows per row-chunk
PRESCALE_CQ = 128    # output columns per column-chunk
PRESCALE_SMAX = 2    # stride bound of the round-3 original class
PRESCALE_SMAXES = (1, 2, 3)  # the compiled crop classes, tightest first


def _prescale_rw(smax: int, rq: int = PRESCALE_RQ) -> int:
    """Source rows read per row-chunk: smax*(RQ-1)+1 span + 7 sublane
    alignment, padded to a 128-multiple MXU contraction dim (128 at
    stride 1, 256 at strides 2-3, at the default RQ)."""
    return -(-(smax * (rq - 1) + 1 + 7) // 128) * 128


def _prescale_cww(smax: int, cq: int = PRESCALE_CQ) -> int:
    """Source cols read per col-chunk: smax*(CQ-1)+1 span + 127 lane
    alignment, padded to a 128-multiple MXU contraction dim (256 / 384 /
    512 at strides 1 / 2 / 3, at the default CQ)."""
    return -(-(smax * (cq - 1) + 1 + 127) // 128) * 128


def _rha(x):
    """round-half-away for the non-negative index range (floor(x+0.5));
    negatives differ only where the result is clipped/blacked anyway."""
    return jnp.floor(x + 0.5)


def _prescale_geometry(rrect, M: int):
    """Shared integer-grid geometry for both prescale implementations.

    Returns ``(left, top, sx, sy)`` f32: the sample grid is
    ``x(q) = rha(left + (q+0.5)*sx - 0.5)`` with integer ``sx`` and
    ``left`` snapped to the half-integer grid, which collapses to exact
    integer arithmetic ``x(q) = Lx + (sx-1)//2 + sx*q`` with
    ``Lx = left + 0.5`` (see `_prescale_take_u32`).
    """
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
    return left, top, sx, sy, bw, bh


def _prescale_take_u32(image_u32, rrect, M: int):
    """XLA index-vector-take prescale: NN-resample the rotated view's
    bounding box to ``[M, M] u32`` (one RGBA pixel per element).

    The exact-fallback lane: handles any stride / frame size. OOB pixels
    become 0 (Color::NONE semantics, image/mod.rs:239-247).
    """
    H, W = image_u32.shape[0], image_u32.shape[1]
    left, top, sx, sy, _bw, _bh = _prescale_geometry(rrect, M)

    q = jnp.arange(M, dtype=jnp.float32) + 0.5
    xs = _rha(left + q * sx - 0.5)
    ys = _rha(top + q * sy - 0.5)
    # OOB indices sample 0 (Color::NONE semantics). NB: the fill sentinel
    # must be >= size — jnp.take wraps NEGATIVE indices (numpy semantics)
    # before fill applies.
    xi = jnp.where((xs >= 0) & (xs < W), xs, np.float32(W)).astype(jnp.int32)
    yi = jnp.where((ys >= 0) & (ys < H), ys, np.float32(H)).astype(jnp.int32)
    # Rows FIRST: M dynamic-slices of CONTIGUOUS frame rows. The takes
    # run on the frame in u32 form (one RGBA pixel per element): a
    # u8[..., 4] column take scalarizes to per-byte touches while the u32
    # form gathers whole pixels. The OOB fill 0 is RGBA(0,0,0,0).
    rows = jnp.take(image_u32, yi, axis=0, mode="fill", fill_value=0)
    patch32 = jnp.take(rows, xi, axis=1, mode="fill", fill_value=0)  # [M, M]
    return patch32


def _prescale_pallas_kernel(
    coef_ref, frame_ref, out_ref, crop, rs, sem,
    *, M, CH, CW, RW, CWW, H, W, S, dbuf, RQ=PRESCALE_RQ, CQ=PRESCALE_CQ,
    pack=1,
):
    """Per-view prescale: one bbox-covering crop DMA + blocked one-hot
    row/column int8 MXU selections (replaces the XLA gather lowering of
    `jnp.take`, which touches rows at ~15 GB/s effective).

    Grid: ``(N // pack,)``. coefs (SMEM i32 [N, 6]): ystart, xstart
    (crop window origin, 8/128-aligned), ly_eff, lx_eff (first sample
    index: ``L + (s-1)//2``), sy, sx (integer strides, <= the class's
    smax).

    ``dbuf``: the crop scratch is ``[2, CH, CW]`` (``[1, CH, CW]`` when
    off) and view g+1's crop DMA is issued before view g's compute
    (classic double buffering: the ~0.9 ms of serial crop DMA at batch
    128 / stride 2 hides under the selection matmuls). Default ON for
    every class — the caller raises the scoped-vmem limit to fit two
    crops; the flag remains as the A/B knob.

    ``pack``: views processed per grid step (same per-view math run
    sequentially over the packed out block; crop double-buffering
    alternates across the GLOBAL view sequence, so it works across pack
    boundaries unchanged). Amortizes the per-grid-step fixed cost the
    same way the rotate kernel's view_pack does — bit-identical results.
    """
    step = pl.program_id(0)
    n_views = pl.num_programs(0) * pack

    for pv in range(pack):
        g = step * pack + pv  # global view index
        cur = _crop_dma_step(
            coef_ref, frame_ref, crop, sem, g, pv, n_views,
            dbuf=dbuf, S=S, CH=CH, CW=CW,
        )
        _prescale_view_compute(
            coef_ref, g, crop, cur, rs, out_ref, pv,
            M=M, CH=CH, CW=CW, RW=RW, CWW=CWW, H=H, W=W, RQ=RQ, CQ=CQ,
        )


def _crop_dma_step(coef_ref, frame_ref, crop, sem, g, pv, n_views, *,
                   dbuf, S, CH, CW, nbuf=None):
    """One view's crop-DMA sequencing (shared by the standalone prescale
    kernel and the fused kernel): issue/wait the bbox-covering crop DMA
    for global view ``g``, double-buffered across the GLOBAL view
    sequence when ``dbuf`` (prefetch view g+1's crop during view g's
    selection matmuls). Returns the buffer slot holding view g's crop.

    ``nbuf``: crop-buffer slot count (default 2 when ``dbuf`` else 1).
    The fused kernel's stride-1 DIRECT mode keeps ``pack + 1`` slots so
    a whole view block's crops stay live across its rotate grid steps
    (the rotate reads them in place of the prescaled intermediate)."""
    if nbuf is None:
        nbuf = 2 if dbuf else 1

    def dma_for(view, slot):
        """Crop DMA for ``view`` into buffer ``slot``. The crop origin
        is pre-aligned by the caller (8-sublane / 128-lane grids);
        multiple_of carries the proof to Mosaic's slice checker. The
        window covers every in-frame source index the view can select
        (the caller's coverage predicate guarantees it; uncovered views
        take the XLA fallback branch)."""
        ys = pl.multiple_of(coef_ref[view, 0], 8)
        xs = pl.multiple_of(coef_ref[view, 1], 128)
        return pltpu.make_async_copy(
            frame_ref.at[view // S, pl.ds(ys, CH), pl.ds(xs, CW)],
            crop.at[slot],
            sem.at[slot],
        )

    if dbuf:
        cur = lax.rem(g, nbuf)
        if pv == 0:
            @pl.when(g == 0)
            def _():
                dma_for(0, 0).start()

        @pl.when(g + 1 < n_views)
        def _():
            dma_for(g + 1, lax.rem(g + 1, nbuf)).start()

        dma_for(g, cur).wait()
    else:
        cur = lax.rem(g, nbuf) if nbuf > 1 else 0
        cp = dma_for(g, cur)
        cp.start()
        cp.wait()
    return cur


def _prescale_view_compute(coef_ref, g, crop, cur, rs, dst, dv, *,
                           M, CH, CW, RW, CWW, H, W, RQ, CQ):
    """One view's prescale selection matmuls, reading the crop in buffer
    ``cur`` and writing the ``[M, M] u32`` intermediate to
    ``dst[dv]`` — the standalone kernel's HBM-backed out block, or the
    fused kernel's VMEM-resident scratch."""
    n_rc = M // RQ
    n_cc = M // CQ

    iota_rw = lax.broadcasted_iota(jnp.int32, (RQ, RW), 1)
    iota_q = lax.broadcasted_iota(jnp.int32, (RQ, RW), 0)
    iota_cw = lax.broadcasted_iota(jnp.int32, (CWW, CQ), 0)
    iota_j = lax.broadcasted_iota(jnp.int32, (CWW, CQ), 1)

    ly = coef_ref[g, 2]
    lx = coef_ref[g, 3]
    sy = coef_ref[g, 4]
    sx = coef_ref[g, 5]
    ystart = pl.multiple_of(coef_ref[g, 0], 8)
    xstart = pl.multiple_of(coef_ref[g, 1], 128)

    for rc in range(n_rc):
        # Source rows for output rows [rc*RQ, rc*RQ+RQ): yi = ly +
        # sy*q, exact integers — no rounding wiggle. Window start
        # aligns DOWN to the 8-sublane grid and clamps inside the
        # crop.
        y_first = ly + sy * (rc * RQ)
        rw0 = jnp.clip(((y_first - ystart) // 8) * 8, 0, CH - RW)
        rw0 = pl.multiple_of(rw0, 8)
        win = crop[cur, pl.ds(rw0, RW), :]  # [RW, CW] u32

        # ohy[q, r]: r == (yi(q) - ystart - rw0), masked to in-frame
        # sources (OOB rows contribute 0 — the take path's fill).
        yi = ly + sy * (iota_q + rc * RQ)
        yrel = yi - ystart - rw0
        oky = (yi >= 0) & (yi < H)
        ohy = ((iota_rw == yrel) & oky).astype(jnp.int8)  # [RQ, RW]
        # [RQ, 1] in-frame row mask for the final re-bias.
        oky1 = oky[:, :1].astype(jnp.int32)

        # Row-select each channel: values re-biased to [-128, 127]
        # so the products stay exact in int8 x int8 -> int32 MXU
        # math; the results ((px-128) or 0) fit int8 exactly and
        # land in the rs scratch so column chunks can window them
        # with pl.ds. (An rc%2-alternating rs double buffer —
        # removing the WAR hazard between chunk rc's column matmuls
        # and chunk rc+1's unpack/row matmuls — was tried in round 4
        # and measured flat-to-worse on device: Mosaic's scheduler
        # does not exploit the extra ILP here. Reverted; single
        # buffer stands.)
        w32 = win.astype(jnp.int32)
        for ch in range(3):
            ch_i8 = (
                ((w32 >> (8 * ch)) & 0xFF) - 128
            ).astype(jnp.int8)  # [RW, CW]
            rs[ch * RQ:(ch + 1) * RQ, :] = jnp.dot(
                ohy, ch_i8, preferred_element_type=jnp.int32
            ).astype(jnp.int8)

        for cc in range(n_cc):
            x_first = lx + sx * (cc * CQ)
            cw0 = jnp.clip(
                ((x_first - xstart) // 128) * 128, 0, CW - CWW
            )
            cw0 = pl.multiple_of(cw0, 128)
            xj = lx + sx * (iota_j + cc * CQ)
            xrel = xj - xstart - cw0
            okx = (xj >= 0) & (xj < W)
            ohx = ((iota_cw == xrel) & okx).astype(jnp.int8)

            sel = jnp.dot(
                rs[:, pl.ds(cw0, CWW)], ohx,
                preferred_element_type=jnp.int32,
            ).reshape(3, RQ, CQ)

            # Re-bias: +128 where the source index is in-frame. The
            # coverage predicate guarantees every in-frame source
            # within the view bbox (+ the rotate kernel's rounding
            # wiggle) is in the crop window, so cells the rotate
            # kernel can read are exact; in-frame cells of the
            # M-grid far outside the bbox may miss the window (empty
            # one-hot -> 128 here vs a real pixel on the take path)
            # but are never selected downstream.
            ind = oky1 * okx[:1, :].astype(jnp.int32)  # [RQ, CQ]
            px = sel + 128 * ind[None]
            out32 = px[0] | (px[1] << 8) | (px[2] << 16)
            dst[
                dv,
                rc * RQ:(rc + 1) * RQ,
                cc * CQ:(cc + 1) * CQ,
            ] = out32.astype(jnp.uint32)


def _prescale_coefs(rrect_flat, M, H, W, smax):
    """Per-view prescale kernel coefs (SMEM i32 ``[N, 6]``): crop-window
    origin (8/128-aligned), first sample index ``L + (s-1)//2`` and the
    integer strides — shared by the standalone prescale kernel and the
    fused kernel."""
    CH, CW = _crop_shape(H, W, M, smax)

    def coefs_one(rr):
        left, top, sx, sy, bw, bh = _prescale_geometry(rr, M)
        sxi = sx.astype(jnp.int32)
        syi = sy.astype(jnp.int32)
        lx = (left + 0.5).astype(jnp.int32) + (sxi - 1) // 2
        ly = (top + 0.5).astype(jnp.int32) + (syi - 1) // 2
        # Crop origin: align down to the DMA grid, clamped inside the
        # frame. Coverage of all in-frame sample indices follows from
        # the caller's bbox predicate (bbox + align + slack <= CH/CW).
        # 16-px back-off: the rotate kernel's two-stage index rounding can
        # select sources up to ~4 prescale cells (~8 px at stride 2) past
        # the bbox edge; 16 covers it with margin on both sides (the
        # coverage predicate reserves the same slack at the high edge).
        # The clamp limits are themselves ALIGNED (Mosaic requires the
        # window origin on the 8-sublane/128-lane grid); the frame rows/
        # cols past the aligned limit are guarded by the predicate.
        cx0 = rr[0] - bw * 0.5
        cy0 = rr[1] - bh * 0.5
        xstart = jnp.clip(
            ((jnp.floor(cx0).astype(jnp.int32) - 16) // 128) * 128,
            0, ((W - CW) // 128) * 128,
        )
        ystart = jnp.clip(
            ((jnp.floor(cy0).astype(jnp.int32) - 16) // 8) * 8,
            0, ((H - CH) // 8) * 8,
        )
        return jnp.stack([ystart, xstart, ly, lx, syi, sxi])

    return jax.vmap(coefs_one)(rrect_flat)


def _prescale_pallas(image_u32, rrect_flat, M, S, interpret, smax,
                     dbuf=None, rq=None, cq=None, pack=None):
    """Batched Pallas prescale: ``[B,H,W] u32`` frames + ``[N,5]`` rects
    -> ``[N, M, M] u32`` intermediates. Only called on batches whose
    every view passes `_prescale_coverage_ok` for this crop class.

    ``rq``/``cq``: selection chunk blocking (default PRESCALE_RQ/CQ).
    Swept on device and measured a NO-OP for the full sampler
    (benchsuite prescale-sweep) — kept as A/B knobs.

    ``pack``: views per grid step (the rotate kernel's view_pack cure
    tried on the prescale's ~18 us/view stride-independent cost).
    Measured a NO-OP on device — unlike the rotate kernel, a prescale
    view's work is one serial dependency chain (crop DMA wait -> row
    selects -> col selects through the rs scratch), so packing
    amortizes nothing and slightly hurts tilted shapes (5.89 -> 5.97
    ms/step at theta=1.0; benchsuite prescale-sweep pack arms).
    Default (None): 1; the knob + device parity remain as the record.
    Bit-identical results at any pack."""
    B, H, W = image_u32.shape
    N = rrect_flat.shape[0]
    rq = rq or PRESCALE_RQ
    cq = cq or PRESCALE_CQ
    assert M % rq == 0 and M % cq == 0, (M, rq, cq)
    if pack is None or pack < 1 or N % pack:
        pack = 1
    CH, CW = _crop_shape(H, W, M, smax)

    coefs = _prescale_coefs(rrect_flat, M, H, W, smax)  # [N, 6] i32

    # Double-buffer the crop DMA (prefetch view v+1 during view v's
    # selection matmuls). Measured on device (examples/r3bench6.py):
    # prescale isolation 3.99 -> 2.95 ms/step at batch 128 / stride 2 —
    # most of the ~1 ms serial crop-DMA hidden. Two 7.7 MB stride-3
    # crops + the pipelined [M, M] u32 output blocks exceed the
    # compiler's DEFAULT 16 MB scoped-vmem budget (observed demand
    # 17.09 MB at stride 2), so the call raises vmem_limit_bytes to the
    # computed demand + temporaries margin — v5e's physical VMEM
    # (128 MB) has ample headroom; the scoped default is a compiler
    # knob, not the hardware.
    # ``dbuf`` must flow from a STATIC caller argument when forced: an
    # env var read here is invisible to jit's trace cache (a second
    # trace with the same shapes+statics silently reuses the first).
    if dbuf is None:
        dbuf = True
    nbuf = 2 if dbuf else 1
    # Crops + double-buffered output blocks + row-select scratch, plus
    # ~6 MB for Mosaic temporaries (win casts, one-hot masks, iotas —
    # the observed stride-2 dbuf demand was ~4.3 MB above the buffer
    # sum) and headroom.
    vmem_demand = (
        nbuf * CH * CW * 4 + 2 * pack * M * M * 4 + 3 * rq * CW
    )
    vmem_limit = min(vmem_demand + 8 * 2**20, 100 * 2**20)

    kern = functools.partial(
        _prescale_pallas_kernel, M=M, CH=CH, CW=CW,
        RW=_prescale_rw(smax, rq), CWW=_prescale_cww(smax, cq),
        H=H, W=W, S=S, dbuf=dbuf, RQ=rq, CQ=cq, pack=pack,
    )
    return pl.pallas_call(
        kern,
        grid=(N // pack,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coefs [N, 6]
            pl.BlockSpec(memory_space=pl.ANY),      # frames [B, H, W] u32
        ],
        out_specs=pl.BlockSpec(
            (pack, M, M), lambda v: (v, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, M, M), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((nbuf, CH, CW), jnp.uint32),
            pltpu.VMEM((3 * rq, CW), jnp.int8),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        # The double-buffer carries DMA state across grid steps: the
        # grid must run sequentially on one core (no megacore split).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(coefs, image_u32)


def _crop_shape(H: int, W: int, M: int = PRESCALE_M, smax: int = PRESCALE_SMAX):
    """Static crop-window shape for one Pallas-prescale crop class: the
    class handles strides <= smax, so the largest admissible bbox is
    ~smax*M — a smaller M needs a proportionally smaller crop (a
    hand-path M=256 view otherwise DMAs a 5.3 MB M=512-sized window for
    a <=514 px bbox). Rows cover smax*M + back-off/rounding slack +
    8-sublane alignment; columns the same + 128-lane alignment; both
    clipped to what the frame can supply (a class whose span exceeds a
    frame dimension covers that whole dimension — every in-frame index
    is then reachable and the bbox bound on that axis is moot, see
    `_prescale_coverage_ok`)."""
    CH = min(-(-(smax * M + 48) // 8) * 8, (H // 8) * 8)
    CW = min(-(-(smax * M + 168) // 128) * 128, (W // 128) * 128)
    return CH, CW


def _prescale_coverage_ok(rrect_flat, M, H, W, smax=PRESCALE_SMAX,
                          rq=None, cq=None):
    """Batch-scalar predicate: every view's crop window (of the ``smax``
    crop class) covers all its in-frame sample indices AND its strides
    fit the class's static chunk windows (<= smax)."""
    CH, CW = _crop_shape(H, W, M, smax)
    if (
        CH < _prescale_rw(smax, rq or PRESCALE_RQ)
        or CW < _prescale_cww(smax, cq or PRESCALE_CQ)
    ):
        return jnp.asarray(False)

    xlim = ((W - CW) // 128) * 128 + CW  # cols the clamped window can reach
    ylim = ((H - CH) // 8) * 8 + CH

    def one(rr):
        _l, _t, sx, sy, bw, bh = _prescale_geometry(rr, M)
        ok = (sx <= smax) & (sy <= smax)
        # bbox + window alignment loss (127/7) + 16-px back-off +
        # matching high-edge rounding slack fits the static crop. When
        # the crop already spans the WHOLE frame dimension (CW == W /
        # CH == H), the window origin clamps to 0 and every in-frame
        # index on that axis is reachable — no bbox bound needed (the
        # per-chunk RW/CWW windows track their chunk regardless).
        if CW < W:
            ok &= bw <= np.float32(CW - 160)
        if CH < H:
            ok &= bh <= np.float32(CH - 40)
        # Odd-sized frames leave up to 127/7 IN-FRAME edge pixels beyond
        # the aligned clamp limit uncoverable — reject views touching
        # them. (xlim == W / ylim == H for aligned frames: no condition.)
        if xlim < W:
            ok &= rr[0] + bw * 0.5 + 16.0 <= np.float32(xlim)
        if ylim < H:
            ok &= rr[1] + bh * 0.5 + 16.0 <= np.float32(ylim)
        return ok

    return jnp.all(jax.vmap(one)(rrect_flat))


def _sampler_coefs(rrect, out_w: int, out_h: int, left, top, sx, sy):
    """Per-stream scalars for the rotate kernel's index math.

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


def _unpack3_i8(band_u32):
    """[P, XW] u32 pixels -> [3P, XW] int8 channel bands re-biased by
    -128 (u8 value - 128 exactly; integer MXU math stays exact)."""
    b32 = band_u32.astype(jnp.int32)
    chans = [
        (((b32 >> (8 * ch)) & 0xFF) - 128).astype(jnp.int8) for ch in range(3)
    ]
    return jnp.concatenate(chans, axis=0)


def _rotate_kernel(
    coef_ref, planar_ref, out_ref, band, sem, *, M, P, XW, out_w, out_h,
    cols, rows_pb, int8_mxu, hoist_band, rolled=False, fuse3=None,
    resident=False, xroll=False, view_pack=1,
):
    blk = pl.program_id(1)
    cb = pl.program_id(2)
    lanes = rows_pb * cols

    # One or more views per grid step (``view_pack``): packing views
    # amortizes the per-step fixed cost — the measured kernel limiter
    # (BENCHMARKS "block count is the kernel's cost driver") — without
    # growing the one-hot contraction. ``pv`` indexes the delivered
    # VMEM blocks (planar/out); ``b`` stays the global view index
    # (SMEM coefs, ANY-space planar in the non-resident mode, which
    # requires view_pack == 1 — it shares one band/sem scratch).
    for pv in range(view_pack):
        out_ref[pv, 0, 0] = _rotate_one_view(
            coef_ref, planar_ref, band, sem,
            pl.program_id(0) * view_pack + pv, pv, blk, cb, lanes,
            M=M, P=P, XW=XW, out_w=out_w, out_h=out_h, cols=cols,
            rows_pb=rows_pb, int8_mxu=int8_mxu, hoist_band=hoist_band,
            rolled=rolled, fuse3=fuse3, resident=resident, xroll=xroll,
        )


def _rotate_one_view(
    coef_ref, planar_ref, band, sem, b, pv, blk, cb, lanes, *,
    M, P, XW, out_w, out_h, cols, rows_pb, int8_mxu, hoist_band,
    rolled, fuse3, resident, xroll, direct=None,
):
    # ``direct`` (fused stride-1 classes only): read the view's RAW crop
    # window instead of a prescaled intermediate. At stride 1 the
    # prescale is a pure translation — intermediate[q] == crop[q + dy,
    # q + dx] for in-frame sources (dy = ly - ystart, dx = lx - xstart,
    # both per-view integers) and every OFF-frame source index provably
    # falls outside the crop-space window clamps ([0, SH - P] x
    # [0, SW - XW]; crop rows/cols are all in-frame), so the existing
    # in-window masks yield the same black. The selection math is
    # unchanged up to the constant shifts — bit-identical by
    # construction, device-verified (benchsuite parity s1-direct arms).
    if direct is not None:
        dsrc, dslot, SH, SW, dy, dx = direct
    else:
        SH, SW = M, M
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
        # u32 intermediate at static offset 0, delivered as a regular
        # VMEM block — Mosaic's pipeline copies it once per view and
        # reuses it across all (blk, cb) steps (the block index map is
        # b-only), eliminating the per-block re-DMA.
        start = xstart = 0
    else:
        # Window start: min x/y over the block's corners, with slack.
        # The intermediate is u32 (one pixel per element), so dynamic
        # sublane offsets need only 8-alignment (f32/i32 tiling is
        # (8, 128)) — the y start rounds down, eating <= 7 rows of the
        # P-row envelope.
        corners = [
            q_of(j0 + jc, k0 + kc, rounded=False)
            for jc in (0.0, float(cols - 1))
            for kc in (0.0, float(rows_pb - 1))
        ]
        xmin = functools.reduce(jnp.minimum, [c[0] for c in corners])
        ymin = functools.reduce(jnp.minimum, [c[1] for c in corners])
        ybase = jnp.floor(ymin).astype(jnp.int32) - 4
        xbase = jnp.floor(xmin).astype(jnp.int32)
        if direct is not None:
            # Crop-space window: shift by the view's translation and
            # clamp to the crop dims (8/128-multiples by _crop_shape).
            ybase = ybase + dy
            xbase = xbase + dx
        start = jnp.clip(ybase, 0, SH - P)
        start = pl.multiple_of((start // 8) * 8, 8)
        if rolled:
            # Rolled-window mode (full-band + square views): the
            # intermediate is VMEM-resident; x needs no DMA alignment
            # because the kernel ROLLS the lanes (below), so the window
            # shrinks to the coverage bound itself (~4x less one-hot
            # contraction).
            xstart = jnp.clip(xbase - 4, 0, SW - XW)
        elif xroll:
            # Banded + x-roll (resident only): like the rolled mode, a
            # dynamic lane roll below replaces the 128-lane alignment, so
            # the window start needs no alignment and XW shrinks to the
            # coverage bound itself (~2x less one-hot contraction than
            # the aligned banded window).
            xstart = jnp.clip(xbase - 4, 0, SW - XW)
        else:
            # Banded config; lane offsets must be 128-aligned (the
            # <=127-column loss is covered by the x-window margin proof).
            xstart = jnp.clip(xbase - 3, 0, SW - XW)
            xstart = pl.multiple_of((xstart // 128) * 128, 128)

            if not resident:
                # One [P, XW] u32 window DMA (whole pixels; channels
                # unpack in VMEM below). In RESIDENT mode the whole
                # intermediate is a per-view VMEM block instead and the
                # window is an aligned slice of it — one 1 MB stream per
                # view beats 30+ scattered per-block window DMAs,
                # especially for tilted views whose windows land on
                # scattered rows.
                cp = pltpu.make_async_copy(
                    planar_ref.at[b, pl.ds(start, P), pl.ds(xstart, XW)],
                    band, sem,
                )
                cp.start()

    t = lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    jj = (t % cols).astype(jnp.float32) + j0
    kk = (t // cols).astype(jnp.float32) + k0
    qx, qy = q_of(jj, kk, rounded=True)
    jq = jnp.floor(qx + 0.5).astype(jnp.int32)  # [1, lanes]
    kq = jnp.floor(qy + 0.5).astype(jnp.int32)
    if direct is not None:
        jq = jq + dx
        kq = kq + dy
    xrel = jq - xstart  # [1, lanes]
    yrel = kq - start
    # Out-of-range columns/rows select nothing -> sample 0 (black), same
    # as the OOB rule; in-range selections are exact one-hots. (Window
    # starts are clamped to [0, M-size], so "in window" implies "inside
    # the intermediate" — OOB semantics are preserved exactly.)
    iota_x = lax.broadcasted_iota(jnp.int32, (XW, lanes), 0)
    iota_p = lax.broadcasted_iota(jnp.int32, (P, lanes), 0)
    my = (iota_p == yrel)                                   # [P, lanes]

    def _src_window(rows, cols_slice):
        # Direct mode reads the view's raw crop slot; otherwise the
        # prescaled intermediate's per-view VMEM block.
        if direct is not None:
            return dsrc[dslot, rows, cols_slice]
        return planar_ref[pv, rows, cols_slice]

    if hoist_band and rolled:
        # Window extraction from the resident u32 intermediate: 8-aligned
        # dynamic y-slice, then a 128-aligned lane pre-slice of width
        # XW + 128 and ONE dynamic lane roll bring source column
        # ``xstart`` to lane 0. Rolling u32 pixels needs no bitcast
        # (Mosaic's dynamic rotate is 32-bit), and the narrow pre-slice
        # keeps the roll ~4x cheaper than rolling the full M lanes.
        x128 = jnp.clip((xstart // 128) * 128, 0, SW - (XW + 128))
        x128 = pl.multiple_of(x128, 128)
        off = xstart - x128  # in [0, 128]
        win = _src_window(pl.ds(start, P), pl.ds(x128, XW + 128))
        win = pltpu.roll(win, (XW + 128) - off, axis=1)[:, :XW]
        band = win  # [P, XW] u32
    elif hoist_band:
        band = planar_ref[pv]  # [M, M] u32 for view b, resident in VMEM
    elif resident and xroll:
        # Unaligned x window from the resident intermediate: 128-aligned
        # pre-slice of width XW + 128, ONE dynamic lane roll brings
        # source column ``xstart`` to lane 0 (same extraction as the
        # rolled mode, under banded blocking — works for any views, no
        # square promise needed, since the x-span LP bound is
        # rotation-independent).
        x128 = jnp.clip((xstart // 128) * 128, 0, SW - (XW + 128))
        x128 = pl.multiple_of(x128, 128)
        off = xstart - x128  # in [0, 128]
        win = _src_window(pl.ds(start, P), pl.ds(x128, XW + 128))
        band = pltpu.roll(win, (XW + 128) - off, axis=1)[:, :XW]
    elif resident:
        band = _src_window(pl.ds(start, P), pl.ds(xstart, XW))
    else:
        cp.wait()
        band = band[:]
    # The fused 3-channel matmul makes one [3P, lanes] selection
    # intermediate; fall back to a per-channel loop when that would
    # crowd VMEM (large full-band configs: P=M, col_split=1).
    # ``fuse3`` overrides the heuristic (perf A/B knob).
    fused3 = (
        fuse3 if fuse3 is not None else 3 * P * lanes * 4 <= 4 * 2**20
    )
    ind = ((xrel >= 0) & (xrel < XW) & (yrel >= 0) & (yrel < P))
    if int8_mxu:
        # Channel values re-biased to [-128, 127] (px - 128 exactly). The
        # dot then yields (pixel-128)·[x in window]; masking rows and
        # adding back 128·[x and y in window] reconstructs the exact
        # pixel. All integer arithmetic — bit-identical to the bf16
        # path, at 2x the MXU rate.
        ohx = (iota_x == xrel).astype(jnp.int8)            # [XW, lanes]
        my_i = my.astype(jnp.int32)
        if fused3:
            band_i8 = _unpack3_i8(band)                    # [3P, XW]
            sel = jnp.dot(
                band_i8, ohx, preferred_element_type=jnp.int32
            ).reshape(3, P, lanes)
            v = jnp.sum(sel * my_i[None], axis=1)          # [3, lanes]
        else:
            b32 = band.astype(jnp.int32)
            v = jnp.concatenate([
                jnp.sum(
                    jnp.dot(
                        (((b32 >> (8 * ch)) & 0xFF) - 128).astype(jnp.int8),
                        ohx, preferred_element_type=jnp.int32,
                    ) * my_i,
                    axis=0, keepdims=True,
                )
                for ch in range(3)
            ])
        return (v + 128 * ind.astype(jnp.int32)).astype(jnp.float32)
    else:
        # bf16 MXU path: u8 values <= 255 < 2^8 are exact in bf16, and
        # one-hot selection is exact — same results as int8.
        ohx = (iota_x == xrel).astype(jnp.bfloat16)        # [XW, lanes]
        b32 = band.astype(jnp.int32)
        my_f = my.astype(jnp.float32)
        chans_bf = [
            ((b32 >> (8 * ch)) & 0xFF).astype(jnp.bfloat16)
            for ch in range(3)
        ]
        if fused3:
            band_bf = jnp.concatenate(chans_bf, axis=0)    # [3P, XW]
            sel = jnp.dot(
                band_bf, ohx, preferred_element_type=jnp.float32
            ).reshape(3, P, lanes)
            return jnp.sum(sel * my_f[None], axis=1)
        return jnp.concatenate([
            jnp.sum(
                jnp.dot(ch_bf, ohx, preferred_element_type=jnp.float32)
                * my_f,
                axis=0, keepdims=True,
            )
            for ch_bf in chans_bf
        ])


def _fused_kernel(
    pcoef_ref, rcoef_ref, frame_ref, out_ref, crop, rs, inter, sem, *,
    M, CH, CW, RW, CWW, H, W, S, dbuf, RQ, CQ, pack,
    P, XW, out_w, out_h, cols, rows_pb, int8_mxu, hoist_band, rolled,
    fuse3, resident, xroll, direct=False, nbuf=None,
):
    """Fused prescale+rotate (TODO_NEXT r4 #1a): one kernel runs both
    sampler stages, so the ``[N, M, M] u32`` intermediate lives ONLY in
    the ``inter`` VMEM scratch — it never round-trips HBM (≈2 MB/view of
    write+read traffic at M=512), and the two kernels' per-view pipeline
    fixed costs collapse into one.

    Grid: ``(N // pack, n_blocks, col_split)`` — identical blocking to
    the standalone rotate kernel. The prescale stage for a view block's
    ``pack`` views runs under ``pl.when`` at the block's FIRST grid step
    (blk == 0, cb == 0), writing ``inter[pv]``; the remaining steps are
    pure rotate blocks reading ``inter`` exactly like the resident /
    hoisted modes read their delivered planar block. The crop DMA
    double-buffering carries across grid steps unchanged (the prefetch
    for the NEXT view block is issued at the current block's first step
    and hides under its rotate blocks). Sequential grid required
    (dimension_semantics all "arbitrary") — DMA state and ``inter``
    carry across steps.

    Bit-identical to the two-kernel path by construction: both stages
    are the same `_prescale_view_compute` / `_rotate_one_view` bodies on
    the same coefs.

    ``direct`` (stride-1 classes only): skip the prescale compute
    entirely — at stride 1 the intermediate is a pure TRANSLATION of
    the crop, so the rotate stage reads the crop scratch itself with
    the per-view (dy, dx) = (ly - ystart, lx - xstart) shift folded
    into its window offsets (see `_rotate_one_view`). ``nbuf`` crop
    slots (pack + 1) keep a view block's crops live across its rotate
    grid steps; ``rs``/``inter`` are unused (None)."""
    b0 = pl.program_id(0)
    blk = pl.program_id(1)
    cb = pl.program_id(2)
    lanes = rows_pb * cols
    n_views = pl.num_programs(0) * pack

    @pl.when((blk == 0) & (cb == 0))
    def _():
        for pv in range(pack):
            g = b0 * pack + pv
            cur = _crop_dma_step(
                pcoef_ref, frame_ref, crop, sem, g, pv, n_views,
                dbuf=dbuf, S=S, CH=CH, CW=CW, nbuf=nbuf,
            )
            if not direct:
                _prescale_view_compute(
                    pcoef_ref, g, crop, cur, rs, inter, pv,
                    M=M, CH=CH, CW=CW, RW=RW, CWW=CWW, H=H, W=W, RQ=RQ,
                    CQ=CQ,
                )

    for pv in range(pack):
        g = b0 * pack + pv
        if direct:
            nb = nbuf if nbuf is not None else (2 if dbuf else 1)
            d = (
                crop,
                lax.rem(g, nb),
                CH,
                CW,
                pcoef_ref[g, 2] - pcoef_ref[g, 0],  # dy = ly - ystart
                pcoef_ref[g, 3] - pcoef_ref[g, 1],  # dx = lx - xstart
            )
        else:
            d = None
        out_ref[pv, 0, 0] = _rotate_one_view(
            rcoef_ref, inter, None, None, g, pv, blk, cb,
            lanes,
            M=M, P=P, XW=XW, out_w=out_w, out_h=out_h, cols=cols,
            rows_pb=rows_pb, int8_mxu=int8_mxu, hoist_band=hoist_band,
            rolled=rolled, fuse3=fuse3, resident=resident, xroll=xroll,
            direct=d,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_w", "out_h", "lo", "hi", "interpret", "prescale_m", "band_p",
        "col_split", "win_x", "int8_mxu", "rows_per_block", "square_views",
        "pallas_prescale", "fuse3", "resident", "xroll", "prescale_dbuf",
        "view_pack", "prescale_rq", "prescale_cq", "prescale_pack",
        "fused", "s1_direct",
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
    pallas_prescale: bool = True,
    fuse3: bool | None = None,
    resident: bool | None = None,
    xroll: bool | None = None,
    prescale_dbuf: bool | None = None,
    view_pack: int | None = None,
    prescale_rq: int | None = None,
    prescale_cq: int | None = None,
    prescale_pack: int | None = None,
    fused: bool | None = None,
    s1_direct: bool | None = None,
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
      <= band_p - ~12``; ``band_p == prescale_m`` disables banding and
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
      contraction) while keeping ANY-rotation coverage. Results are
      identical for square views; non-square views may read black.
    - ``pallas_prescale``: build the intermediate with the crop-resident
      Pallas kernel when a batch-scalar coverage predicate holds (all
      strides <= 3, bboxes within one of the static crop classes — the
      tightest admissible class runs, stride-1 first), falling back to
      the XLA take path per batch otherwise. All paths produce index-identical intermediates;
      the knob exists for A/B timing.
    - ``xroll``: in the RESIDENT banded mode, extract each block's
      x-window with a 128-aligned pre-slice + one dynamic lane roll
      (exactly the rolled mode's extraction) instead of a 128-aligned
      slice. Drops the <=127-column alignment loss from the coverage
      requirement, so ``win_x`` can shrink to the span bound itself
      (e.g. 128 instead of 256 at the face shape — ~2x less one-hot
      contraction). Exact for ANY views (the x-span LP bound is
      rotation-independent; no square promise involved). Requires the
      resident mode and ``M >= win_x + 128``; silently ignored
      otherwise. Default (None): auto-ON for resident BANDED configs
      with ``win_x`` unset, which then defaults to 128 — measured
      9.8 -> 8.7 ms/step at the face shape, bit-identical
      (examples/r3bench5.py). Full-band configs (``band_p ==
      prescale_m``) keep the rolled mode instead.
    - ``prescale_dbuf``: double-buffer the Pallas prescale's per-view
      crop DMA (prefetch view v+1's crop during view v's selection
      matmuls). Default (None): ON — the kernel raises its scoped-vmem
      limit to cover two crops of every class (max ~24 MB at stride 3,
      well under v5e's 128 MB physical VMEM). Bit-identical either way;
      the knob exists for A/B timing — prescale isolation measured
      3.99 -> 2.95 ms/step at batch 128 / stride 2
      (examples/r3bench6.py).
    - ``view_pack``: rotate-kernel views per grid step. Packing views
      amortizes the per-step fixed cost (the measured kernel limiter)
      without changing per-view geometry or the one-hot contraction —
      bit-identical results. Silently falls back to 1 unless the
      intermediate is VMEM-delivered (resident / full-band modes), the
      view count divides evenly, and the packed blocks stay
      VMEM-friendly (pack·M²·4 B <= 4 MB). Default (None): auto — the
      largest admissible pack in {4, 2} (face-shape sampler measured
      6.73 -> 5.66 ms/step at batch 128, benchsuite sampler pack arms).
    - ``prescale_rq`` / ``prescale_cq``: Pallas-prescale selection chunk
      blocking (output rows / cols per chunk; must divide M). Wider
      chunks mean fewer per-chunk ops but wider one-hot contraction
      windows (RW/CWW grow with smax·chunk); swept on device and
      measured a NO-OP for the full sampler (benchsuite
      prescale-sweep). Index-identical results at any admissible
      blocking. Default (None): PRESCALE_RQ/CQ.
    - ``prescale_pack``: Pallas-prescale views per grid step (the
      rotate kernel's view_pack tried on the prescale). Measured a
      NO-OP on device (a prescale view is one serial dependency chain;
      benchsuite prescale-sweep pack arms) — default 1, knob kept as
      the A/B record. Bit-identical results at any pack.
    - ``fused``: run prescale + rotate as ONE Pallas kernel — the
      ``[N, M, M] u32`` intermediate lives only in VMEM scratch (no HBM
      round trip; the two kernels' per-view pipeline fixed costs
      collapse). Admissible when ``pallas_prescale`` is on and the
      rotate stage reads its intermediate as a VMEM block (resident /
      full-band/rolled modes — every shipped serving config); falls
      back to the two-kernel path otherwise. Bit-identical by
      construction (same compute bodies, same coefs) — device-verified
      per crop class and at the rolled hand shape (benchsuite parity).
      Default (None): auto-ON when admissible — same-session device
      A/B at batch 128 (best/median ms/step): face 836 px s2
      5.91/6.14 -> 5.41/5.59, s3 tilt 6.12/6.28 -> 5.80/5.87, 360 px
      s1 5.24/5.33 -> 4.69/4.80, hand rolled-224 12.46/12.49 ->
      11.48/11.76 (benchsuite sampler/hand fused arms, 2026-08-19).
      Pass False to A/B the two-kernel path (``prescale_pack`` applies
      only there).
    - ``s1_direct``: in the FUSED kernel's stride-1 crop class, skip the
      prescale compute entirely — at stride 1 the intermediate is a
      pure translation of the view's crop, so the rotate stage reads
      the crop scratch itself with the per-view (dy, dx) shift folded
      into its window offsets. Every off-frame source index provably
      falls outside the crop-space window clamps (crop rows/cols are
      all in-frame), so the in-window masks reproduce the OOB-black
      semantics — bit-identical by construction, device-verified
      (benchsuite parity s1-direct arms, incl. a frame-corner OOB
      view). Admissible for the rolled / resident-banded rotate modes
      (every shipped stride-1 serving shape). MEASURED A SPEED NO-OP
      on device (2026-08-19, batch 128/64x4 best ms/step: face 360 px
      banded 4.74 direct vs 4.76 selection; rolled 170 px 11.38 vs
      11.44 — benchsuite sampler/hand s1 arms): deleting the entire
      class-1 selection compute moves nothing, the conclusive proof
      that the sampler is bound by its per-view serial DMA/grid-step
      chain, not by selection math. Default OFF (the established
      selection path stays shipped); True engages the direct mode —
      kept, with its parity arms, as the formulation-change record.
    """
    assert rrect.shape[0] == image_u8.shape[0] and rrect.shape[-1] == 5
    # Mosaic is TPU-only; on CPU (unit tests, virtual meshes) the kernel
    # runs in interpreter mode, which jit compiles to plain XLA.
    interpret = interpret or jax.default_backend() != "tpu"
    M = prescale_m or PRESCALE_M
    P = min(band_p or BAND_P, M)
    XW = min(win_x or WIN_X, M)
    # x-roll needs the resident intermediate (its pre-slice reads the
    # whole [M, M] VMEM block) and room for the 128-lane pre-slice;
    # resolve the resident auto-default early so both the coverage bound
    # and the kernel agree. (A full-band/rolled config downgrades
    # ``resident`` below; those modes never consult ``covered`` with an
    # active window, so the early resolution stays consistent.)
    if resident is None:
        resident = M * M * 4 <= 2 * 2**20
    if xroll is None:
        # Auto-ON for resident banded configs: the roll-extracted window
        # shrinks to the span bound (XW 256 -> 128 at the face shape) —
        # measured 9.8 -> 8.7 ms/step upright, 14.6 -> 13.8 tilted, at
        # batch 128 (examples/r3bench5.py), bit-identical results.
        # P < M keeps full-band configs (band_p == prescale_m, e.g. the
        # hand path's rolled M=256) on their own mode — the rolled-mode
        # search below requires XW == M.
        xroll = bool(resident) and win_x is None and M >= 256 and P < M
    if xroll and win_x is None:
        XW = min(128, M)
    # The roll extraction clips its 128-aligned pre-slice start to
    # M - (XW + 128) and asserts 128-alignment on the result — the claim
    # is only TRUE when that clip bound is itself a 128-multiple (false
    # multiple_of miscompiles on Mosaic), i.e. M and XW both are.
    xroll = (
        bool(xroll) and bool(resident) and XW < M and M >= XW + 128
        and M % 128 == 0 and XW % 128 == 0
    )

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
    # overridden. It needs M >= 256 (the fixed 128-lane window plus the
    # 128-aligned pre-slice); smaller intermediates fall back to the
    # plain full-band kernel.
    rolled = False
    # M % 128 == 0: the rolled pre-slice clips its start to M - 256 and
    # asserts 128-alignment — only true for 128-multiple M (see xroll).
    if (square_views and P == M and XW == M and out_w == out_h
            and M >= 256 and M % 128 == 0):
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
                # +7: the y-start rounds DOWN to an 8-sublane multiple in
                # the kernel (u32 intermediate), eating up to 7 window
                # rows; the x roll needs no such allowance (unaligned).
                p_r = min(-(-(span + 7) // 8) * 8, M)
                col_split, rows_pb, P, XW = cs, rpb, p_r, 128
                rolled = hit = True
                break
            if hit:
                break

    # x-window coverage: a block's source-x span in prescale units is
    #   cols*cos*(w/sx)/out_w + rows*sin*(h/sy)/out_h
    # — rotation mixes output ROWS into source x, so the span depends on
    # rows_per_block too. With u = w/sx, v = h/sy (both <= M - margin by
    # the prescale bbox constraints u*cos + v*sin <= M-m and
    # u*sin + v*cos <= M-m), the objective A*cos*u + B*sin*v with
    # A = cols/out_w, B = rpb/out_h is bounded by
    # max(A, B)*(cos*u + sin*v) <= max(A, B)*(M-m) at ANY rotation.
    # (The round-3 face default once forced rpb=64 > cols=32 under an
    # older bound that dropped the rpb term — steep rotations of views
    # >= ~400 px then read up to ~22% black: a silent serving bug caught
    # by review, reproduced, and fixed by this bound.) The usable window
    # past a block's xmin is XW - 128 (128-alignment + floor), and index
    # rounding adds <= ~2.5 px of wiggle per side (two-stage
    # round-half-away, |c|+|s| <= sqrt(2)) plus up to ~2 px of additional
    # margin error at stride > 1; 10 px of slack covers both with room.
    def covered(cs, rpb):
        # x-roll replaces the 128-lane DMA alignment (and its <=127-col
        # loss) with a dynamic roll; only the span + rounding slack must
        # fit the window then.
        slack = 0 if xroll else 128
        span = (M - PRESCALE_MARGIN) * max(
            (out_w // cs) / out_w, rpb / out_h
        )
        return XW - slack >= span + 10

    if not rolled:
        def rpb_for(cs):
            # Rows per block: bigger blocks amortize per-block overhead —
            # the measured kernel limiter (r3bench2: 36 blocks/view at
            # rpb=32 ran the face sampler in 11.1 ms vs 15.1 at rpb=16
            # and 23.1 at col_split=12) — capped so blocks keep their
            # [3P, lanes] selection intermediates VMEM-friendly.
            # ``rows_per_block`` overrides (bounded by what VMEM actually
            # fits — Mosaic errors loudly if it doesn't).
            if rows_per_block:
                return rows_per_block
            cols_ = out_w // cs
            if out_h % 32 == 0 and 32 * cols_ <= 1024:
                return 32
            if out_h % 16 == 0 and 16 * cols_ <= 2048:
                return 16
            return ROWS_PER_BLOCK

        def any_rotation(cs):
            # Banded y-band coverage at ANY rotation: a block's source-y
            # span is <= (M-margin)*max(cols, rows_pb)/out_w (same LP as
            # the x-window proof, by symmetry — square outputs only);
            # + 7 rows of 8-sublane alignment loss, + ~8 of rounding
            # wiggle/back-off must fit the P-row band. Round 2's "±38°
            # envelope" was the old col_split=4 / 32-align geometry; the
            # current auto configs (e.g. cs=6 at M=512/out 192) cover
            # the full circle.
            if out_w != out_h:
                return False
            span = (M - PRESCALE_MARGIN) * max(out_w // cs, rpb_for(cs)) / out_w
            return span + 15 <= P

        if col_split is None:
            # Auto: the smallest divisor of out_w whose blocks the
            # x-window provably covers (smaller splits = fewer, bigger
            # blocks = less per-block overhead; span shrinks ∝
            # 1/col_split) — preferring configs whose y-band ALSO covers
            # any rotation, so the serving paths need no angle clamp.
            candidates = [c for c in range(2, 33) if out_w % c == 0]
            col_split = next(
                (c for c in candidates
                 if covered(c, rpb_for(c)) and any_rotation(c)),
                None,
            ) or next(
                (c for c in candidates if c >= 4 and covered(c, rpb_for(c))),
                4 if out_w % 4 == 0 else 1,
            )
        rows_pb = rpb_for(col_split)
        # Never silently clip: without a coverage proof, disable the
        # window (and the roll extraction, whose pre-slice needs
        # XW + 128 <= M).
        if not covered(col_split, rows_pb):
            XW = M
            xroll = False
    assert out_w % col_split == 0
    assert out_h % rows_pb == 0
    B = image_u8.shape[0]
    slot_dims = rrect.shape[1:-1]
    rrect_flat = rrect.reshape(B, -1, 5)
    S = rrect_flat.shape[1]
    cols = out_w // col_split
    lanes = rows_pb * cols
    n_blocks = out_h // rows_pb

    # One RGBA pixel per element for all prescale work: u8 [..., 4]
    # gathers scalarize to per-byte touches on TPU, u32 moves whole
    # pixels (bit-identical relayout).
    image_u32 = lax.bitcast_convert_type(image_u8, jnp.uint32)  # [B, H, W]
    H, W = image_u32.shape[1], image_u32.shape[2]
    N = B * S

    def coefs_one(rr):
        left, top, sx, sy, _bw, _bh = _prescale_geometry(rr, M)
        return _sampler_coefs(rr, out_w, out_h, left, top, sx, sy)

    coefs = jax.vmap(jax.vmap(coefs_one))(rrect_flat).reshape(N, -1)

    def take_path(ops):
        img32, rrf = ops
        pl_ = jax.vmap(
            jax.vmap(
                lambda im, rr: _prescale_take_u32(im, rr, M),
                in_axes=(None, 0),
            )
        )(img32, rrf)
        return pl_.reshape(N, M, M)

    def pallas_path_for(smax):
        def path(ops):
            img32, rrf = ops
            return _prescale_pallas(
                img32, rrf.reshape(N, 5), M, S, interpret, smax,
                prescale_dbuf, prescale_rq, prescale_cq, prescale_pack,
            )

        return path

    def class_admissible(smax_c):
        """Static admissibility of a crop class: the frame must supply
        its chunk windows (smaller frames — tiny test images — fall
        through to the take path)."""
        _ch, _cw = _crop_shape(H, W, M, smax_c)
        return (
            _ch >= _prescale_rw(smax_c, prescale_rq or PRESCALE_RQ)
            and _cw >= _prescale_cww(smax_c, prescale_cq or PRESCALE_CQ)
        )

    def class_chain(fallback, path_for):
        """Nested batch-scalar conds over the crop classes, tightest
        (stride-1) first: the first class whose predicate admits the
        whole batch runs its Pallas path; ``fallback`` (built on the
        exact XLA take prescale) runs otherwise. lax.cond traces every
        branch of the chain."""
        chain = fallback
        for smax_c in reversed(PRESCALE_SMAXES):
            if not class_admissible(smax_c):
                continue
            ok = _prescale_coverage_ok(
                rrect_flat.reshape(N, 5), M, H, W, smax_c,
                prescale_rq, prescale_cq,
            )
            chain = (
                lambda ok, path, prev: (
                    lambda ops: lax.cond(ok, path, prev, ops)
                )
            )(ok, path_for(smax_c), chain)
        return chain

    # Full-band configs (P == M and XW == M) read the ENTIRE per-view
    # intermediate with static offsets, so the window can be a regular
    # VMEM block whose index map depends only on the view: Mosaic copies
    # it once per view and reuses it across all (blk, cb) grid steps,
    # instead of re-issuing the [P, XW] DMA per block.
    hoist_band = rolled or (P == M and XW == M)
    # RESIDENT banded mode: deliver the whole [M, M] u32 intermediate as
    # a per-view VMEM block (like the full-band/rolled modes) and take
    # each block's window as an aligned slice — replaces 30+ scattered
    # per-block window DMAs with one streamed copy per view. Measured at
    # the face shape (batch 128): 11.2 -> 8.9 ms/step upright,
    # 16.5 -> 14.1 tilted. Default ON whenever the intermediate fits
    # VMEM comfortably (<= 2 MB, i.e. M <= 724).
    resident = bool(resident) and not hoist_band
    xroll = xroll and resident
    # View packing: run ``pack`` views per grid step to amortize the
    # per-step fixed cost — the measured kernel limiter — without
    # changing per-view geometry or the one-hot contraction. Needs the
    # VMEM-delivered intermediate (resident or hoisted full band; the
    # non-resident mode shares one band/sem scratch per step), an evenly
    # divisible view count, and packed blocks that stay VMEM-friendly.
    # Default (None): auto — the largest admissible pack in {4, 2};
    # measured at the face shape, batch 128: 6.73 -> 5.96 -> 5.66
    # ms/step at pack 1/2/4 upright, 7.04 -> 6.01 tilted, bitwise-equal
    # on device (benchsuite sampler pack arms). Auto considers powers
    # of two only: serving batches are powers of two (the slot engines
    # flatten [B,S] with S in {1,2,4}), pack 4 measured within ~5% of
    # the amortization asymptote (1/pack scaling of the fixed cost has
    # little left beyond 4), and an odd pack (e.g. 3) would cover
    # oddball view counts at the cost of another compiled kernel shape
    # per config — pass view_pack explicitly for such batches. The
    # 4 MiB block gate is measured-heuristic and PRE-double-buffering:
    # Mosaic pipelines the (pack, M, M) input block, so steady-state
    # VMEM holds ~2x the gate (8 MiB at pack 4 / M=512) — still far
    # under v5e's 128 MiB physical VMEM; the gate bounds the pipelined
    # working set, not a hard budget.
    def _pack_ok(p):
        return (
            (hoist_band or resident)
            and N % p == 0
            and p * M * M * 4 <= 4 * 2**20
        )

    if view_pack is None:
        pack = next((p for p in (4, 2) if _pack_ok(p)), 1)
    else:
        pack = view_pack if view_pack > 1 and _pack_ok(view_pack) else 1
    kernel = functools.partial(
        _rotate_kernel, M=M, P=P, XW=XW, out_w=out_w, out_h=out_h,
        cols=cols, rows_pb=rows_pb, int8_mxu=int8_mxu,
        hoist_band=hoist_band, rolled=rolled, fuse3=fuse3,
        resident=resident, xroll=xroll, view_pack=pack,
    )
    out_spec = pl.BlockSpec(
        (pack, 1, 1, 3, lanes), lambda b, blk, cb: (b, blk, cb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_struct = jax.ShapeDtypeStruct(
        (N, n_blocks, col_split, 3, lanes), jnp.float32
    )

    def rotate_call(planar):
        if hoist_band or resident:
            kern = lambda coef_ref, planar_ref, out_ref: kernel(
                coef_ref, planar_ref, out_ref, None, None
            )
            planar_spec = pl.BlockSpec(
                (pack, M, M), lambda b, blk, cb: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
            scratch = []
        else:
            kern = kernel
            planar_spec = pl.BlockSpec(memory_space=pl.ANY)
            scratch = [
                pltpu.VMEM((P, XW), jnp.uint32),
                pltpu.SemaphoreType.DMA(()),
            ]
        return pl.pallas_call(
            kern,
            grid=(N // pack, n_blocks, col_split),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # coefs [N, 12]
                planar_spec,  # planar [N, M, M] u32
            ],
            out_specs=out_spec,
            out_shape=out_struct,
            scratch_shapes=scratch,
            interpret=interpret,
        )(coefs, planar)

    def fused_call_for(smax):
        """Fused prescale+rotate pallas_call for one crop class — same
        blocking and coefs as the two-kernel path, intermediate in VMEM
        scratch only (see `_fused_kernel`)."""
        CHc, CWc = _crop_shape(H, W, M, smax)
        rq_ = prescale_rq or PRESCALE_RQ
        cq_ = prescale_cq or PRESCALE_CQ
        dbuf_ = True if prescale_dbuf is None else prescale_dbuf
        # Stride-1 DIRECT mode: the class-1 intermediate is a pure
        # translation of the crop, so the rotate stage reads the crop
        # scratch itself and the prescale compute (row/col selection
        # matmuls, channel unpack/repack, inter writes) vanishes.
        # Admissible for the window-read rotate modes (rolled /
        # resident banded) whose crop-space window clamps preserve the
        # OOB-black semantics; the crop dims carry the needed 8/128
        # alignment by _crop_shape. ``pack + 1`` crop slots keep a view
        # block's crops live across its rotate steps (+1 = the next
        # block's prefetch target).
        direct_c = (
            s1_direct_on and smax == 1
            and (rolled or resident)
            and CHc % 8 == 0 and CWc % 128 == 0 and CHc >= P
            and (
                CWc >= XW + 128 and XW % 128 == 0
                if (rolled or xroll) else CWc >= XW
            )
        )
        if direct_c:
            nbuf = (pack + 1) if dbuf_ else pack
            vmem_demand = (
                nbuf * CHc * CWc * 4 + 2 * pack * 3 * lanes * 4
            )
        else:
            nbuf = 2 if dbuf_ else 1
            # Crops + inter scratch + rs scratch + pipelined out blocks,
            # plus ~8 MB for Mosaic temporaries and headroom (same sizing
            # rationale as `_prescale_pallas`).
            vmem_demand = (
                nbuf * CHc * CWc * 4 + pack * M * M * 4 + 3 * rq_ * CWc
                + 2 * pack * 3 * lanes * 4
            )
        vmem_limit = min(vmem_demand + 8 * 2**20, 100 * 2**20)
        kern = functools.partial(
            _fused_kernel, M=M, CH=CHc, CW=CWc,
            RW=_prescale_rw(smax, rq_), CWW=_prescale_cww(smax, cq_),
            H=H, W=W, S=S, dbuf=dbuf_, RQ=rq_, CQ=cq_, pack=pack,
            P=P, XW=XW, out_w=out_w, out_h=out_h, cols=cols,
            rows_pb=rows_pb, int8_mxu=int8_mxu, hoist_band=hoist_band,
            rolled=rolled, fuse3=fuse3, resident=resident, xroll=xroll,
            direct=direct_c, nbuf=nbuf,
        )
        if direct_c:
            # No rs / inter scratch in direct mode — different
            # pallas_call scratch arity.
            def kern_call(pc, rc, fr, out, crop_s, sem_s):
                kern(pc, rc, fr, out, crop_s, None, None, sem_s)

            scratch = [
                pltpu.VMEM((nbuf, CHc, CWc), jnp.uint32),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ]
        else:
            kern_call = kern
            scratch = [
                pltpu.VMEM((nbuf, CHc, CWc), jnp.uint32),
                pltpu.VMEM((3 * rq_, CWc), jnp.int8),
                pltpu.VMEM((pack, M, M), jnp.uint32),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ]

        def call(ops):
            img32, rrf = ops
            pcoefs = _prescale_coefs(rrf.reshape(N, 5), M, H, W, smax)
            return pl.pallas_call(
                kern_call,
                grid=(N // pack, n_blocks, col_split),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # pcoefs [N, 6]
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # rcoefs [N, 12]
                    pl.BlockSpec(memory_space=pl.ANY),  # frames [B, H, W]
                ],
                out_specs=out_spec,
                out_shape=out_struct,
                scratch_shapes=scratch,
                # DMA double-buffering and the inter/crop scratches carry
                # state across grid steps: strictly sequential grid.
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(
                        "arbitrary", "arbitrary", "arbitrary"
                    ),
                    vmem_limit_bytes=vmem_limit,
                ),
                interpret=interpret,
            )(pcoefs, coefs, img32)

        return call

    # Fused dispatch: admissible whenever the rotate stage reads its
    # intermediate as a VMEM block (resident / hoisted full-band) and
    # the Pallas prescale is on. The class chain then selects a FUSED
    # kernel per crop class, with take-prescale + standalone rotate as
    # the exact fallback.
    fused_ok = bool(pallas_prescale) and (hoist_band or resident)
    use_fused = fused_ok if fused is None else (bool(fused) and fused_ok)
    # s1_direct rides the fused kernel only; per-class admission lives
    # in fused_call_for (needs the class's crop dims). Default OFF: the
    # mode measured a speed NO-OP at both class-1 serving shapes (see
    # the docstring), so the established selection-prescale path stays
    # the shipped default and the knob remains as the A/B record.
    s1_direct_on = bool(s1_direct)
    if use_fused:
        out = class_chain(
            lambda ops: rotate_call(take_path(ops)), fused_call_for
        )((image_u32, rrect_flat))
    elif pallas_prescale:
        planar = class_chain(take_path, pallas_path_for)(
            (image_u32, rrect_flat)
        )
        out = rotate_call(planar)
    else:
        out = rotate_call(take_path((image_u32, rrect_flat)))

    adjust = np.float32((hi - lo) / 255.0)
    out = out * adjust + np.float32(lo)
    # [N, nrb, cs, 3, rows_pb*cols] -> [B, ..., out_h, out_w, 3]
    out = out.reshape(N, n_blocks, col_split, 3, rows_pb, cols)
    out = jnp.transpose(out, (0, 1, 4, 2, 5, 3)).reshape(N, out_h, out_w, 3)
    return out.reshape((B, *slot_dims, out_h, out_w, 3))
