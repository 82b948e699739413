"""Micro-benchmark: the MXU rotated-ROI sampler's internal cost split.

The fast sampler (ops/rotated_fast.py) is the fused cascade's dominant
cost (~19 ms of the ~39 ms step at batch 128, BENCHMARKS.md). This tool
times its stages in isolation on the real chip so optimization work
(x-window banding, int8 MXU, DMA double-buffering) is measured, not
guessed:

- ``prescale``  — the XLA row/column-take stage alone ([3, M, M] planar)
- ``fast``      — the full sampler (prescale + Pallas rotate kernel)
- ``fast-...``  — option variants (col_split / band_p / window knobs)
- ``exact``     — the pointwise-gather exact path, for scale

Each path runs inside a scan whose ROI is perturbed by a tiny function of
the previous output, so XLA cannot hoist the loop body; every window
forces a real readback (the tunnel's block_until_ready does not block).

Usage: python examples/samplerbench.py [batch]   (default 128)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

SCAN_STEPS = int(os.environ.get("ZARU_TPU_SB_SCAN", "32"))
WINDOWS = int(os.environ.get("ZARU_TPU_SB_WINDOWS", "4"))
OUT_W = OUT_H = 192


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))

    from zaru_tpu.ops import rotated_fast as rf
    from zaru_tpu.ops.sampling import sample_view

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from bench import make_1080p_frame

    frame = make_1080p_frame()
    print(
        f"device: {jax.devices()[0].device_kind}; batch={batch}, "
        f"scan={SCAN_STEPS}, windows={WINDOWS}",
        file=sys.stderr,
    )

    frame_dev = jax.device_put(jnp.asarray(frame))
    frames = jax.jit(
        lambda f: jnp.broadcast_to(f[None], (batch, *f.shape)) + 0
    )(frame_dev)
    jax.block_until_ready(frames)

    # A realistic face-sized rotated ROI (fixture face is ~600 px at 1080p).
    rr0 = jnp.broadcast_to(
        jnp.asarray([960.0, 540.0, 620.0, 620.0, 0.15], jnp.float32),
        (batch, 5),
    )

    def scan_of(fn):
        @jax.jit
        def run(frames, rr):
            def body(rr, _):
                out = fn(frames, rr)
                # Tiny data dependence defeats loop-invariant hoisting.
                rr = rr + 1e-30 * jnp.sum(out)
                return rr, jnp.sum(out)

            _rr, sums = lax.scan(body, rr, jnp.arange(SCAN_STEPS))
            return jnp.sum(sums)

        return run

    def prescale_only(frames, rr):
        planar, *_ = jax.vmap(rf._prescale_planar, in_axes=(0, 0, None))(
            frames, rr, rf.PRESCALE_M
        )
        return jnp.sum(planar.astype(jnp.float32)) / 1e9

    paths = {
        "prescale": scan_of(prescale_only),
        "fast": scan_of(lambda f, r: rf.rotated_sample_fast(f, r, OUT_W, OUT_H)),
        "exact": scan_of(
            jax.vmap(lambda f, r: sample_view(f, r, OUT_W, OUT_H), (0, 0))
        ),
    }
    for name, run in paths.items():
        try:
            float(run(frames, rr0))  # compile + one readback
        except Exception as e:  # keep probing other paths on a wedge
            print(f"{name:14s} FAILED: {e}", file=sys.stderr)
            continue
        best = float("inf")
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            float(run(frames, rr0))
            best = min(best, (time.perf_counter() - t0) / SCAN_STEPS)
        print(
            f"batch {batch:4d}  {name:14s} {best * 1e3:8.2f} ms/step  "
            f"{batch / best:10.0f} views/s"
        )


if __name__ == "__main__":
    main()
