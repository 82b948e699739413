#!/usr/bin/env python3
"""View-pack A/B for the rotate kernel (round 3).

The rotate kernel's measured limiter is per-grid-step fixed cost
(BENCHMARKS "block count is the kernel's cost driver"); ``view_pack``
runs 2/4 views per step to amortize it without growing the one-hot
contraction (ops/rotated_fast.py). This batch, on device at the face
shape (M=512 auto blocking, 836 px view, batch 128):

- ``parity``: pack 2/4 bitwise-equal to pack 1 ON DEVICE (the kernel
  body changed — ADVICE r2 #4's device-pinning rule applies), upright
  and tilted, plus the hand-shape rolled mode at pack 4.
- ``speed``: full-sampler isolation, pack 1 vs 2 vs 4, upright and
  theta=1.0.

Usage: python examples/r3bench9.py [out.jsonl] [parity speed]

Timing honesty: every window forces a device→host readback (np.asarray);
jax.block_until_ready does NOT block through this tunnel (CLAUDE.md).
"""

from __future__ import annotations

import os
import sys
import time

from _common import bench_log as log
from _common import make_bench_frame, make_emit, timed_windows

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3bench9.jsonl"
WHICH = set(sys.argv[2:]) or {"parity", "speed"}

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

emit = make_emit(OUT)

B = int(os.environ.get("ZARU_TPU_R9_BATCH", "128"))
STEPS = int(os.environ.get("ZARU_TPU_R9_STEPS", "16"))
WINDOWS = int(os.environ.get("ZARU_TPU_R9_WINDOWS", "4"))


def main():
    from zaru_tpu.ops.rotated_fast import rotated_sample_fast

    dev = jax.devices()[0]
    log(f"on {dev.platform} ({dev.device_kind}); B={B}")
    frame = make_bench_frame()
    frame_dev = jax.device_put(jnp.asarray(frame))
    frames = jax.jit(
        lambda f: jnp.broadcast_to(f[None], (B, *f.shape)) + 0
    )(frame_dev)
    np.asarray(frames[0, 0, 0])

    def rects(theta, size=836.0):
        rr = np.zeros((B, 5), np.float32)
        rr[:] = [1038.0, 595.0, size, size, theta]
        return jnp.asarray(rr)

    if "parity" in WHICH:
        for theta in (0.0, 1.0):
            rr = rects(theta)
            base = jax.jit(
                lambda f, r: rotated_sample_fast(f, r, 192, 192, view_pack=1)
            )(frames, rr)
            base_np = np.asarray(base)
            for pack in (2, 4):
                got = jax.jit(
                    lambda f, r, p=pack: rotated_sample_fast(
                        f, r, 192, 192, view_pack=p
                    )
                )(frames, rr)
                eq = bool((np.asarray(got) == base_np).all())
                emit({
                    "bench": "viewpack_parity", "theta": theta,
                    "pack": pack, "bitwise_equal": eq,
                })
                assert eq, f"device parity FAILED pack={pack} theta={theta}"
        # Rolled hand-shape mode at pack 4.
        rrh = rects(0.7, size=300.0)
        kw = dict(square_views=True, prescale_m=256, band_p=256, col_split=1)
        base = np.asarray(jax.jit(
            lambda f, r: rotated_sample_fast(f, r, 224, 224, view_pack=1, **kw)
        )(frames, rrh))
        got = np.asarray(jax.jit(
            lambda f, r: rotated_sample_fast(f, r, 224, 224, view_pack=4, **kw)
        )(frames, rrh))
        eq = bool((got == base).all())
        emit({"bench": "viewpack_parity", "mode": "rolled224",
              "pack": 4, "bitwise_equal": eq})
        assert eq, "device parity FAILED rolled pack=4"
        log("device parity OK")

    if "speed" in WHICH:
        def scan_sampler(pack):
            @jax.jit
            def run(frames, rr):
                def body(c, _):
                    xs = rotated_sample_fast(
                        frames, rr + c * 1e-6, 192, 192, view_pack=pack
                    )
                    return c + 1.0, jnp.sum(xs[:, 0, 0]) + jnp.sum(xs[:, -1, -1])
                _, outs = lax.scan(body, 0.0, None, length=STEPS)
                return jnp.sum(outs)
            return run

        for theta in (0.0, 1.0):
            rr = rects(theta)
            for pack in (1, 2, 4):
                run = scan_sampler(pack)
                dt = timed_windows(
                    run, frames, rr, n=WINDOWS,
                    label=f"sampler-pack{pack}-th{theta}",
                )
                emit({
                    "bench": "viewpack_speed", "theta": theta, "pack": pack,
                    "ms_per_step": round(dt / STEPS * 1e3, 2),
                })

    log("done")


if __name__ == "__main__":
    main()
