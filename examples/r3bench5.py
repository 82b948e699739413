#!/usr/bin/env python3
"""Round-3 TPU measurement batch 5: x-roll banded sampler A/B.

Follows r3bench2/3's resident-mode result (8.9 ms/step upright at the
face shape). Hypothesis: in RESIDENT banded mode the x-window can be
extracted with the rolled mode's unaligned pre-slice + lane roll, so
win_x shrinks 256 -> 128 (the span bound itself) and the one-hot
contraction halves. Also tries bigger blocks (band_p=192, rpb=64) that
the roll's alignment-free coverage enables.

Usage: python examples/r3bench5.py [out.jsonl]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3bench5.jsonl"

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(rec):
    rec = dict(rec, t=round(time.time()))
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log("RESULT", json.dumps(rec))


def readback(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def make_frame():
    import cv2

    from zaru_tpu.assets import fixture_path
    from zaru_tpu.image import decode as idec

    rgb = idec.load_image(fixture_path("sad_linus.jpg"))[..., :3]
    frame = cv2.resize(rgb, (1920, 1080), interpolation=cv2.INTER_LINEAR)
    return np.concatenate(
        [frame, np.full((1080, 1920, 1), 255, np.uint8)], axis=-1
    )


def timed_windows(fn, *args, n=4, label=""):
    t0 = time.perf_counter()
    readback(fn(*args))
    log(f"[{label}] compile+first: {time.perf_counter() - t0:.1f}s")
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        readback(fn(*args))
        best = min(best, time.perf_counter() - t0)
        log(f"[{label}] window {best * 1e3:.1f} ms best")
    return best


B = 128
STEPS = 16


def main():
    dev = jax.devices()[0]
    log(f"on {dev.platform} ({dev.device_kind})")
    frame = make_frame()
    frames = jax.jit(
        lambda f: jnp.broadcast_to(f[None], (B, *f.shape)) + 0
    )(jax.device_put(jnp.asarray(frame)))
    readback(frames)

    def rects(theta=0.12, size=836.0):
        rr = np.zeros((B, 5), np.float32)
        rr[:] = [1038.0, 595.0, size, size, theta]
        return jnp.asarray(rr)

    from zaru_tpu.ops.rotated_fast import rotated_sample_fast

    def scan_sampler(label, theta=0.12, size=836.0, **opts):
        @jax.jit
        def run(fr, rr):
            def body(c, _):
                out = rotated_sample_fast(
                    fr, rr + c * 1e-6, 192, 192, 0.0, 1.0, **opts
                )
                return c + 1.0, out[:, 0, 0, 0]

            _, outs = lax.scan(body, 0.0, None, length=STEPS)
            return outs

        dt = timed_windows(run, frames, rects(theta, size), label=label)
        emit({"bench": "xroll_ab", "config": label,
              "ms_per_step": round(dt / STEPS * 1e3, 2),
              "fps": round(B * STEPS / dt)})

    XR = dict(win_x=128, xroll=True)
    if "tilt192" in sys.argv:
        # Follow-up: the bp192/rpb64 winner's tilt behavior only.
        scan_sampler("xroll XW128 bp192 rpb64 th1.0", theta=1.0,
                     band_p=192, rows_per_block=64, **XR)
        return
    scan_sampler("resident base (cs6 rpb32 XW256)", resident=True,
                 win_x=256, xroll=False)
    scan_sampler("xroll XW128", **XR)
    scan_sampler("xroll XW128 bp192 rpb64", band_p=192,
                 rows_per_block=64, **XR)
    scan_sampler("resident base th1.0", theta=1.0, resident=True,
                 win_x=256, xroll=False)
    scan_sampler("xroll XW128 th1.0", theta=1.0, **XR)


if __name__ == "__main__":
    main()
