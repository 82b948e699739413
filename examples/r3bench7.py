#!/usr/bin/env python3
"""Bounded-redetect (redetect_bucket) device cost A/B (round 3).

``FaceTracker(redetect_bucket=K)`` bounds the batch-level detection
gate's worst-case frame at detector(K) instead of detector(B): an
unforced detection frame gathers the first K lost streams, detects that
K-batch, and scatters the ROIs back (pipeline/face_cascade.py
``_detect_bucket``; recovery is bit-identical to the full branch —
tests/test_redetect_bucket.py). This is the batched static-shape analog
of the reference's per-stream host-thread redetection
(hand/tracking.rs:41). CPU recovery parity is pinned; this script
records the DEVICE cost at batch 128:

- ``full-steady``    — bucket=None, all streams tracking (the fast path)
- ``full-worst``     — bucket=None, stream 0 re-lost every frame
                       (detection for ALL 128 streams every frame — the
                       gate's documented worst case)
- ``bucket8-steady`` — bucket=8, all tracking (the extra cond must not
                       tax the fast path)
- ``bucket8-worst``  — bucket=8, stream 0 re-lost every frame
                       (detector(8) + scatter every frame)

Usage: python examples/r3bench7.py [out.jsonl]

Timing honesty: every window forces a device→host readback (np.asarray);
jax.block_until_ready does NOT block through this tunnel (CLAUDE.md).
"""

from __future__ import annotations

import os
import sys
import time

from _common import bench_log as log
from _common import make_bench_frame, make_emit

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3bench7.jsonl"

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

emit = make_emit(OUT)

B = int(os.environ.get("ZARU_TPU_R7_BATCH", "128"))
SCAN_STEPS = int(os.environ.get("ZARU_TPU_R7_SCAN", "32"))
WINDOWS = int(os.environ.get("ZARU_TPU_R7_WINDOWS", "4"))


def main():
    from zaru_tpu.pipeline import FaceTracker

    dev = jax.devices()[0]
    log(f"on {dev.platform} ({dev.device_kind}); B={B} scan={SCAN_STEPS}")

    frame = make_bench_frame()
    frame_dev = jax.device_put(jnp.asarray(frame))
    frames = jax.jit(
        lambda f: jnp.broadcast_to(f[None], (B, *f.shape)) + 0
    )(frame_dev)
    np.asarray(frames[0, 0, 0])

    def scan_runner(tracker, relose: bool):
        @jax.jit
        def run(params, st, frames):
            def body(carry, _):
                st2, out = tracker.step_batch(params, carry, frames)
                if relose:
                    st2 = dict(
                        st2, tracking=st2["tracking"].at[0].set(False)
                    )
                return st2, jnp.sum(out["confidence"])

            _st, confs = lax.scan(body, st, jnp.arange(SCAN_STEPS))
            return jnp.sum(confs)

        return run

    # Establish tracking ONCE with the full tracker: an unforced bucket
    # warmup would need ceil(B/K) drain steps (it seeds K streams/frame
    # — tests/test_redetect_bucket.py), and the state dict's structure
    # is identical across bucket configs, so the converged state is
    # shared by all arms.
    full = FaceTracker(redetect_bucket=None)
    state0 = full.init_state(batch=B)
    state0, out = full.run_frames(state0, frames)
    assert bool(np.asarray(out["valid"]).all()), "tracking not established"

    results = {}
    for bucket in (None, 8):
        tracker = FaceTracker(redetect_bucket=bucket) if bucket else full
        state = state0
        tag = "bucket8" if bucket else "full"
        for mode, relose in (("steady", False), ("worst", True)):
            run = scan_runner(tracker, relose)
            label = f"{tag}-{mode}"
            t0 = time.perf_counter()
            float(run(tracker.params, state, frames))
            log(f"[{label}] compile+first: {time.perf_counter() - t0:.1f}s")
            best = float("inf")
            for _ in range(WINDOWS):
                t0 = time.perf_counter()
                float(run(tracker.params, state, frames))
                best = min(best, time.perf_counter() - t0)
            fps = B * SCAN_STEPS / best
            ms = best * 1e3 / SCAN_STEPS
            results[label] = fps
            emit(
                {
                    "bench": "redetect_bucket",
                    "path": label,
                    "batch": B,
                    "fps": round(fps, 1),
                    "ms_per_step": round(ms, 3),
                }
            )

    if {"full-worst", "bucket8-worst"} <= results.keys():
        emit(
            {
                "bench": "redetect_bucket",
                "path": "worst-case-speedup",
                "value": round(results["bucket8-worst"] / results["full-worst"], 3),
            }
        )


if __name__ == "__main__":
    main()
