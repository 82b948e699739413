"""Shared helpers for the examples: frame sources that fall back from
webcam to a static image / fixture so every example also runs headless,
plus the bench-protocol helpers (fixture 1080p frame, readback-honest
window timing, JSONL emit) shared by the measurement scripts."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Honor a CPU override even in environments whose sitecustomize force-
# registers a TPU platform (JAX_PLATFORMS alone is not enough there).
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

from zaru_tpu.assets import fixture_path
from zaru_tpu.image import Image


def frame_source(argv=None, loop_static: int = 30):
    """Yields frames: from a file given on the CLI, else the webcam, else
    the bundled fixture photo (repeated ``loop_static`` times, overridable
    via ZARU_TPU_EXAMPLE_FRAMES for quick smoke runs)."""
    import os

    loop_static = int(os.environ.get("ZARU_TPU_EXAMPLE_FRAMES", loop_static))
    argv = sys.argv[1:] if argv is None else argv
    if argv:
        img = Image.load(argv[0])
        for _ in range(loop_static):
            yield img
        return
    try:
        from zaru_tpu.video.webcam import Webcam, WebcamOptions

        cam = Webcam.open(WebcamOptions())
    except RuntimeError:
        # No usable camera: loop the fixture photo. (Only OPEN failures
        # fall back — a transient mid-stream read error must surface,
        # not silently turn a live camera into a still-photo run.)
        img = Image.load(fixture_path("sad_linus.jpg"))
        for _ in range(loop_static):
            yield img
        return
    try:
        while True:
            yield cam.read()
    finally:
        cam.close()


# --- bench-protocol helpers (r3bench*, irisbench) ------------------------


def bench_log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_emit(out_path):
    """JSONL appender: results stream to the file AND stderr so a wedged
    run still leaves data."""

    def emit(rec):
        rec = dict(rec, t=round(time.time()))
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        bench_log("RESULT", json.dumps(rec))

    return emit


def make_bench_frame():
    """The bench fixture: sad_linus upscaled to 1080p RGBA u8 — the ONE
    shared recipe (zaru_tpu.bench_programs.make_1080p_frame), so every
    bench measures the identical input."""
    from zaru_tpu.bench_programs import make_1080p_frame

    return make_1080p_frame()


def timed_windows_stats(fn, *args, n=4, label=""):
    """``n`` scan-window timings with a REAL device→host readback per
    window (jax.block_until_ready does not block through the axon
    tunnel — CLAUDE.md). Returns ``{"best", "median", "spread", "n"}``
    seconds so contention variance is visible alongside the headline
    (VERDICT r3 weak #7)."""
    import numpy as np

    import jax

    def readback(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0])

    t0 = time.perf_counter()
    readback(fn(*args))
    bench_log(f"[{label}] compile+first: {time.perf_counter() - t0:.1f}s")
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        readback(fn(*args))
        dt = time.perf_counter() - t0
        samples.append(dt)
        bench_log(f"[{label}] window {dt * 1e3:.1f} ms")
    return {
        "best": min(samples),
        "median": float(np.median(samples)),
        "spread": max(samples) - min(samples),
        "n": len(samples),
    }


def timed_windows(fn, *args, n=4, label=""):
    """Best-of-n scan-window seconds (see timed_windows_stats)."""
    return timed_windows_stats(fn, *args, n=n, label=label)["best"]
