"""VMEM-resident fused residual-stage kernel for BlazeBlock CNNs.

Round-2 measurement (BENCHMARKS.md): the cascade CNNs' cost is NOT
FLOPs — each fused dw+pw layer costs the activation HBM round trip plus
a ~0.1 ms floor, ~6 ms/step at batch 128 across FaceMesh's 45 convs.
XLA already fuses each dw3x3+pw1x1 pair, so the only remaining lever is
keeping a whole residual stage's activations ON CHIP. This kernel runs
N consecutive BlazeBlocks

    x_{i+1} = PRelu_i( x_i + pw1x1_i( dw3x3_i( x_i ) ) )

(the exact FaceMesh block shape, face_landmark.onnx: Conv(depthwise) →
Conv(1x1) → Add → PRelu; reference inference loop nn/mod.rs:450-538)
with every intermediate resident in VMEM.

Layout: activations are packed ``[G*C, H*W]`` — G images' C channels on
the 128 sublanes (G = 128 // C, so every stage fills the MXU/VPU sublane
dim exactly), flattened spatial on lanes. Then

- the POINTWISE conv is one full-shape MXU matmul per block:
  ``block_diag(V x G) [128,128] @ act [128, HW]`` — K = M = 128, the
  8x weight inflation (zeros off the diagonal blocks) buys full MXU
  utilization at channel counts (16-128) that would otherwise use
  1/64th of the array;
- the DEPTHWISE conv is 9 masked static lane-rolls (dx = roll ±1,
  dy = roll ±W) with per-sublane tap weights — pure VPU;
- PRelu / bias / residual are per-sublane broadcasts.

Grid: one program per G-image group; all blocks of the stage unrolled
inside, so HBM sees exactly one read of x and one write of the result.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_blocks", "pack_blocks", "blaze_blocks_reference"]


def pack_blocks(blocks, C: int, G: int):
    """Packs per-block BlazeBlock params into the kernel's layout.

    ``blocks``: list of dicts with ``dw_w [C,1,3,3]`` (ONNX depthwise
    layout, group=C), ``dw_b [C]``, ``pw_w [C,C,1,1]``, ``pw_b [C]``,
    ``alpha [C]`` (PRelu slope). Returns stacked arrays:
    taps [nb, 9, 128], wblk [nb, 128, 128], dwb/pwb/alpha [nb, 128].
    """
    nb = len(blocks)
    taps = np.zeros((nb, 9, C * G), np.float32)
    wblk = np.zeros((nb, C * G, C * G), np.float32)
    dwb = np.zeros((nb, C * G), np.float32)
    pwb = np.zeros((nb, C * G), np.float32)
    alpha = np.zeros((nb, C * G), np.float32)
    for i, b in enumerate(blocks):
        dw = np.asarray(b["dw_w"], np.float32).reshape(C, 9)
        pw = np.asarray(b["pw_w"], np.float32).reshape(C, C)  # [out, in]
        for g in range(G):
            sl = slice(g * C, (g + 1) * C)
            taps[i, :, sl] = dw.T
            # act' = wblk @ act with act rows = in-channels:
            # wblk[out_row, in_row] = pw[out, in] per group.
            wblk[i, sl, sl] = pw
            dwb[i, sl] = np.asarray(b["dw_b"], np.float32)
            pwb[i, sl] = np.asarray(b["pw_b"], np.float32)
            alpha[i, sl] = np.asarray(b["alpha"], np.float32).reshape(C)
    return (
        jnp.asarray(taps), jnp.asarray(wblk), jnp.asarray(dwb),
        jnp.asarray(pwb), jnp.asarray(alpha),
    )


def _stage_kernel(
    x_ref, taps_ref, wblk_ref, dwb_ref, pwb_ref, alpha_ref, out_ref,
    *, nb, H, W, C, G
):
    HW = H * W
    S = C * G
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, HW), 1)
    col = lane % W
    # dx masks: shifting left by dx means out[j] = in[j+dx]; a source
    # column outside [0, W) must contribute 0 (conv zero padding).
    mask_dx = {
        -1: (col >= 1).astype(jnp.float32),
        0: jnp.ones((1, HW), jnp.float32),
        1: (col <= W - 2).astype(jnp.float32),
    }
    row = lane // W
    mask_dy = {
        -1: (row >= 1).astype(jnp.float32),
        0: jnp.ones((1, HW), jnp.float32),
        1: (row <= H - 2).astype(jnp.float32),
    }

    x = x_ref[0]  # [S, HW]
    for i in range(nb):
        acc = jnp.broadcast_to(dwb_ref[i][:, None], (S, HW))
        for k, (dy, dx) in enumerate(
            (dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
        ):
            shift = dy * W + dx
            # out[j] = in[j + shift] -> roll by -shift.
            shifted = pltpu.roll(x, (-shift) % HW, axis=1) if shift else x
            m = mask_dy[dy] * mask_dx[dx]
            acc = acc + taps_ref[i, k][:, None] * (shifted * m)
        y = (
            jnp.dot(wblk_ref[i], acc, preferred_element_type=jnp.float32)
            + pwb_ref[i][:, None]
            + x
        )
        a = alpha_ref[i][:, None]
        x = jnp.where(y > 0, y, a * y)
    out_ref[0] = x


@functools.partial(
    jax.jit, static_argnames=("H", "W", "C", "interpret", "group")
)
def fused_blocks(
    x, packed, H: int, W: int, C: int, interpret: bool = False,
    group: int | None = None,
):
    """Runs the packed BlazeBlock stage over ``x [B, C, H, W] f32``.

    ``group`` (default 128//C) = images per kernel program; B must be a
    multiple of it. Smaller groups trade MXU sublane fill for VMEM (a
    96²x16 stage at G=8 holds ~19 MB of live activations — over VMEM;
    G=4 fits). The packed params must be built with the same G. Returns
    the PRelu output of the last block, same shape as x.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    taps, wblk, dwb, pwb, alpha = packed
    nb = taps.shape[0]
    B = x.shape[0]
    G = group or max(1, 128 // C)
    assert B % G == 0, (B, G)
    assert taps.shape[-1] == G * C, (taps.shape, G, C)
    HW = H * W
    xf = x.reshape(B // G, G * C, HW)

    kern = functools.partial(_stage_kernel, nb=nb, H=H, W=W, C=C, G=G)
    out = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((1, G * C, HW), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # taps
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wblk
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dwb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pwb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # alpha
        ],
        out_specs=pl.BlockSpec((1, G * C, HW), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // G, G * C, HW), jnp.float32),
        interpret=interpret,
    )(xf, taps, wblk, dwb, pwb, alpha)
    return out.reshape(B, C, H, W)


def blaze_blocks_reference(x, blocks):
    """XLA reference of the same block chain (the baseline the kernel is
    measured against, and the correctness oracle for tests)."""
    from jax import lax

    for b in blocks:
        dw = lax.conv_general_dilated(
            x, jnp.asarray(b["dw_w"], jnp.float32),
            window_strides=(1, 1), padding="SAME",
            feature_group_count=x.shape[1],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + jnp.asarray(b["dw_b"], jnp.float32)[None, :, None, None]
        pw = lax.conv_general_dilated(
            dw, jnp.asarray(b["pw_w"], jnp.float32),
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + jnp.asarray(b["pw_b"], jnp.float32)[None, :, None, None]
        y = pw + x
        a = jnp.asarray(b["alpha"], jnp.float32).reshape(1, -1, 1, 1)
        x = jnp.where(y > 0, y, a * y)
    return x
