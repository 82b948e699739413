"""Micro-benchmark: the fused multi-face cascade's steady-state throughput.

`pipeline.MultiFaceTracker` (fixed-slot multi-face per stream — beyond the
reference, whose examples track one face) shares the `MultiObjectTracker`
machinery with the hand cascade; this pins its device cost so BENCHMARKS
has a measured row for every fused pipeline. Slots hold synthetic
face-sized rotated ROIs (the step cost is shape-dependent, not
content-dependent) with `loss_threshold=0` keeping them alive, so the
gated step measures the steady landmark state at production cadence off
the detect frame.

Usage: python examples/multifacebench.py [batch [slots]]   (default 64 4)

Timing honesty: every window forces a real device→host readback
(CLAUDE.md: block_until_ready does not block through the tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax

SCAN_STEPS = int(os.environ.get("ZARU_TPU_MFB_SCAN", "8"))
WINDOWS = int(os.environ.get("ZARU_TPU_MFB_WINDOWS", "4"))


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))

    from zaru_tpu.pipeline import MultiFaceTracker
    from bench import make_1080p_frame

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    frame = make_1080p_frame()
    print(f"device: {jax.devices()[0].device_kind}; batch={batch}x{slots}, "
          f"scan={SCAN_STEPS}, windows={WINDOWS}", file=sys.stderr)

    tracker = MultiFaceTracker(max_faces=slots, loss_threshold=0.0)
    if os.environ.get("ZARU_TPU_MFB_ROLLED"):
        # A/B: the hand cascade's rolled full-band config (valid here too:
        # FaceMeshV1 views are square). sampler_opts is read at trace
        # time, so overriding before the first jit call is effective.
        tracker.sampler_opts = {
            "prescale_m": 256, "band_p": 256, "col_split": 1,
            "square_views": True,
        }
        print("sampler: rolled full-band M=256", file=sys.stderr)
    params = tracker.params
    frame_dev = jax.device_put(jnp.asarray(frame))
    frames = jax.jit(
        lambda f: jnp.broadcast_to(f[None], (batch, *f.shape)) + 0
    )(frame_dev)
    np.asarray(frames[0, 0, 0])

    rng = np.random.default_rng(3)
    rois_np = np.stack(
        [
            np.stack(
                [
                    rng.uniform(300, 1600, slots),   # cx
                    rng.uniform(200, 900, slots),    # cy
                    rng.uniform(200, 500, slots),    # face-sized w
                    rng.uniform(200, 500, slots),    # h
                    rng.uniform(-3.0, 3.0, slots),   # any rotation
                ],
                axis=-1,
            )
            for _ in range(batch)
        ]
    ).astype(np.float32)
    state = tracker.init_state(batch=batch)
    state = dict(
        state,
        rois=jnp.asarray(rois_np),
        active=jnp.ones((batch, slots), bool),
        frame=jnp.ones((batch,), jnp.int32),  # off the detect cadence
    )

    @jax.jit
    def run(frames, st):
        def body(carry, _):
            st2, out = tracker.step_batch(params, carry, frames)
            return st2, jnp.sum(out["confidence"])

        _c, sums = lax.scan(body, st, jnp.arange(SCAN_STEPS))
        return jnp.sum(sums)

    t0 = time.perf_counter()
    float(run(frames, state))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        float(run(frames, state))
        best = min(best, (time.perf_counter() - t0) / SCAN_STEPS)
    print(f"batch {batch:3d}x{slots}  gated {best*1e3:8.2f} ms/step "
          f"({batch / best:.0f} fps, {batch * slots / best:.0f} faces/s)")


if __name__ == "__main__":
    main()
