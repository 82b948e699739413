"""Traced programs for the driver benchmark (bench.py).

These live OUTSIDE bench.py on purpose: the persistent XLA compile
cache keys on the traced functions' source locations, so *any* edit to
the file holding them — even a comment above the traced code —
invalidates the prewarmed entries and costs a 70-900 s remote
recompile per program (CLAUDE.md "Environment gotchas"). bench.py is
the orchestration *policy* (budgets, retries, wedge handling) and gets
edited often; the programs below are the stable *measurement* surface.
Edit this file (or the pipeline modules on its trace path) only when
the measured program itself must change, and re-prewarm afterwards
(``python bench.py --prewarm``).

The measured workload is the reference's production serving shape: a
full detection pass every ``detect_every`` frames (the 300 ms redetect
interval at 30 fps, reference hand/tracking.rs:41), landmark+smooth
every frame (reference landmark.rs:463-501), batched over streams and
scan-amortized so the tunnel's per-dispatch latency divides out.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def make_1080p_frame():
    """A realistic 1920x1080 RGBA frame: the fixture photo upscaled."""
    import cv2

    from zaru_tpu.assets import fixture_path
    from zaru_tpu.image import decode as idec

    rgb = idec.load_image(fixture_path("sad_linus.jpg"))[..., :3]
    frame = cv2.resize(rgb, (1920, 1080), interpolation=cv2.INTER_LINEAR)
    return np.concatenate(
        [frame, np.full((1080, 1920, 1), 255, np.uint8)], axis=-1
    )


def tile_frames(frame_dev, batch: int):
    """Tile ONE uploaded frame to a [batch, H, W, 4] device array.

    Through this environment's tunnel a [128, 1080, 1920, 4] host upload
    alone takes minutes; upload once, broadcast on device.
    """
    return jax.jit(
        lambda f: jnp.broadcast_to(f[None], (batch, *f.shape)) + 0
    )(frame_dev)


def build_cascade_scan(tracker, scan_steps: int, detect_every: int):
    """The headline program: ``scan_steps`` production-cadence tracker
    steps in one dispatch. Returns a jitted ``run(params, state, frames)
    -> (state, confidences)``."""

    @jax.jit
    def run_scan(params, state, frames):
        def body(st, t):
            # Forced detection every detect_every frames, batch-gated
            # landmark+smooth otherwise — all on the MXU-sampled fast
            # path (ops/rotated_fast.py).
            st, out = tracker.step_batch(
                params, st, frames, t % detect_every == 0
            )
            return st, out["confidence"]

        return lax.scan(body, state, jnp.arange(scan_steps))

    return run_scan


def measure_tunnel_roundtrip(n: int = 12) -> float:
    """Median seconds for a trivial dispatch + device->host readback —
    the tunnel floor to subtract from single-step latencies for the
    on-device estimate (steady trivial roundtrip ~= 32 ms on this box).

    Each sample runs a tiny jitted op with a FRESH operand so the
    result is a new device buffer: reading back the same array twice
    hits jax's host-side copy cache and measures ~0 (the first prewarm
    run recorded exactly that artifact)."""
    import time

    tiny = jax.device_put(np.zeros((8,), np.float32))
    bump = jax.jit(lambda x, c: x + c)
    np.asarray(bump(tiny, 0.0))  # compile + first transfer
    samples = []
    for i in range(n):
        t0 = time.perf_counter()
        np.asarray(bump(tiny, float(i + 1)))
        samples.append(time.perf_counter() - t0)
    return float(np.median(samples))
