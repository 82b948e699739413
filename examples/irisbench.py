#!/usr/bin/env python3
"""Iris-cascade cadence: production cadence (detect every 9 frames) with
per-frame eye/iris refinement at batch 128 (BASELINE config 4 — the
reference's eye.rs stage fused into the face cascade). Same protocol as
bench.py: lax.scan windows, honest np.asarray readback per window.

Usage: python examples/irisbench.py [batch [out.jsonl]]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/irisbench.jsonl"
STEPS = 16
WINDOWS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import cv2

    from zaru_tpu.assets import fixture_path
    from zaru_tpu.image import decode as idec
    from zaru_tpu.pipeline import FaceTracker

    dev = jax.devices()[0]
    log(f"on {dev.platform} ({dev.device_kind}), batch {B}")
    from zaru_tpu.bench_programs import make_1080p_frame

    frame = make_1080p_frame()  # the one shared bench-fixture recipe
    frames = jax.jit(
        lambda f: jnp.broadcast_to(f[None], (B, *f.shape)) + 0
    )(jax.device_put(jnp.asarray(frame)))
    np.asarray(frames[0, 0, 0])

    tracker = FaceTracker(iris=True)
    state = tracker.init_state(batch=B)

    @jax.jit
    def run_scan(params, state, fr):
        def body(st, t):
            st, out = tracker.step_batch(params, st, fr, t % 9 == 0)
            return st, out["confidence"]

        return lax.scan(body, state, jnp.arange(STEPS))

    t0 = time.perf_counter()
    state, confs = run_scan(tracker.params, state, frames)
    confs = np.asarray(confs)
    log(f"compile+first {time.perf_counter() - t0:.1f}s "
        f"conf {confs[-1].min():.2f}")
    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        _s, confs = run_scan(tracker.params, state, frames)
        np.asarray(confs)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        log(f"window {dt * 1e3:.0f} ms ({B * STEPS / dt:.0f} fps)")
    rec = {
        "bench": "iris_cascade", "batch": B,
        "ms_per_step": round(best / STEPS * 1e3, 2),
        "fps": round(B * STEPS / best),
        "tracked": float(np.asarray(confs)[-1].min()),
        "t": round(time.time()),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
