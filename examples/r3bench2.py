#!/usr/bin/env python3
"""Round-3 TPU measurement batch 2: banded config sweep + stage isolation.

Batch-1 (r3bench.py) findings this follows up:
- pallas+banded 15.0 ms vs take+banded 20.1 (prescale kernel wins);
- rolled full-band 24.7 ms — a regression for the face shape; banded
  auto (col_split=6) provably covers any rotation, so faces went back
  to banded. Here: sweep banded blocking knobs, isolate prescale vs
  rotate cost, re-measure the landmark half with pinned ROIs, and A/B
  the hand cascade's rolled M=256 config against banded.

Usage: python examples/r3bench2.py [out.jsonl] [which ...]
  which ∈ {sweep, stages, landmark, hand} (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3bench2.jsonl"
WHICH = set(sys.argv[2:]) or {"sweep", "stages", "landmark", "hand"}

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
        emit({"bench": "sampler2", "config": label,
              "ms_per_step": round(dt / STEPS * 1e3, 2),
              "fps": round(B * STEPS / dt)})

    if "sweep" in WHICH:
        # Banded blocking knobs around the auto config (cs=6, rpb=16,
        # XW=256). Fewer/bigger blocks vs narrower contraction width.
        scan_sampler("banded auto (cs6 rpb16 XW256)")
        scan_sampler("banded cs4 XW384", col_split=4, win_x=384)
        scan_sampler("banded cs6 rpb32", rows_per_block=32)
        scan_sampler("banded cs12 rpb16", col_split=12)
        scan_sampler("banded cs4 XW384 rpb32", col_split=4, win_x=384,
                     rows_per_block=32)
        # Rotation-flatness of the default at a strong tilt.
        scan_sampler("banded auto theta=1.0", theta=1.0)

    if "stages" in WHICH:
        # Prescale-only isolation (the rotate kernel's input): where do
        # the 15 ms go?
        from zaru_tpu.ops.rotated_fast import (
            PRESCALE_M, _prescale_pallas, _prescale_take_u32,
        )

        img32 = jax.jit(
            lambda f: lax.bitcast_convert_type(f, jnp.uint32)
        )(frames)
        readback(img32)

        @jax.jit
        def run_pallas(fr32, rr):
            def body(c, _):
                pl_ = _prescale_pallas(
                    fr32, rr + c * 1e-6, PRESCALE_M, 1, False, 2
                )
                return c + 1.0, pl_[:, 0, 0]

            _, outs = lax.scan(body, 0.0, None, length=STEPS)
            return outs

        dt = timed_windows(run_pallas, img32, rects(), label="prescale-pallas")
        emit({"bench": "prescale_only", "impl": "pallas",
              "ms_per_step": round(dt / STEPS * 1e3, 2)})

        @jax.jit
        def run_take(fr32, rr):
            def body(c, _):
                pl_ = jax.vmap(
                    lambda im, r: _prescale_take_u32(im, r, PRESCALE_M)
                )(fr32, rr + c * 1e-6)
                return c + 1.0, pl_[:, 0, 0]

            _, outs = lax.scan(body, 0.0, None, length=STEPS)
            return outs

        dt = timed_windows(run_take, img32, rects(), label="prescale-take")
        emit({"bench": "prescale_only", "impl": "take",
              "ms_per_step": round(dt / STEPS * 1e3, 2)})

    if "landmark" in WHICH:
        # Landmark half with PINNED rois (batch-1's version carried the
        # tracker state through the scan, ROIs drifted, strides blew past
        # the Pallas coverage and the take fallback ran — 94 ms of
        # artifact, not signal).
        from zaru_tpu.pipeline import FaceTracker

        tracker = FaceTracker()
        state = tracker.init_state(batch=B)
        state, _ = jax.jit(
            lambda p, s, f: tracker.step_batch(p, s, f, True)
        )(tracker.params, state, frames)
        readback(state["roi"])

        @jax.jit
        def run_track(params, state, fr):
            rois0 = state["roi"]

            def body(c, _):
                st = dict(state, roi=rois0 + c * 1e-6)
                _st, out = tracker._track_batch(
                    params, st, fr, st["roi"],
                    jnp.zeros_like(st["tracking"]),
                )
                return c + 1.0, out["confidence"]

            _, outs = lax.scan(body, 0.0, None, length=STEPS)
            return outs

        dt = timed_windows(run_track, tracker.params, state, frames,
                           label="landmark-half-pinned")
        emit({"bench": "landmark_half_pinned",
              "ms_per_step": round(dt / STEPS * 1e3, 2),
              "fps": round(B * STEPS / dt)})

        # Full production cadence with the round-3 default (banded auto).
        @jax.jit
        def run_scan(params, state, fr):
            def body(st, t):
                st, out = tracker.step_batch(params, st, fr, t % 9 == 0)
                return st, out["confidence"]

            return lax.scan(body, state, jnp.arange(STEPS))

        t0 = time.perf_counter()
        state2, confs = run_scan(tracker.params, state, frames)
        np.asarray(confs)
        log(f"[cascade-banded] compile {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            _s, confs = run_scan(tracker.params, state, frames)
            np.asarray(confs)
            best = min(best, time.perf_counter() - t0)
        emit({"bench": "cascade_banded_auto",
              "ms_per_step": round(best / STEPS * 1e3, 2),
              "fps": round(B * STEPS / best),
              "tracked": float(np.asarray(confs)[-1].min())})

    if "hand" in WHICH:
        # Hand cascade sampler A/B: rolled M=256 (round-2 config) vs
        # banded auto at M=256 (any rotation per the y-band proof).
        from zaru_tpu.pipeline import MultiHandTracker

        HB, S = 64, 4
        hframes = jax.jit(
            lambda f: jnp.broadcast_to(f[None], (HB, *f.shape)) + 0
        )(jax.device_put(jnp.asarray(frame)))
        readback(hframes)
        for label, opts in [
            ("rolled M256 (round2)", {
                "prescale_m": 256, "band_p": 256, "col_split": 1,
                "square_views": True,
            }),
            ("banded auto M256", {"prescale_m": 256}),
        ]:
            tr = MultiHandTracker(max_hands=S, sampler_opts=opts)
            st = tr.init_state(batch=HB)

            @jax.jit
            def run(params, st, fr):
                def body(s, t):
                    s, out = tr.step_batch(params, s, fr)
                    return s, out["presence"]

                return lax.scan(body, st, jnp.arange(STEPS))

            try:
                t0 = time.perf_counter()
                st2, confs = run(tr.params, st, hframes)
                np.asarray(confs)
                log(f"[hand {label}] compile {time.perf_counter() - t0:.1f}s")
                best = float("inf")
                for _ in range(4):
                    t0 = time.perf_counter()
                    _s, confs = run(tr.params, st, hframes)
                    np.asarray(confs)
                    best = min(best, time.perf_counter() - t0)
                emit({"bench": "hand_cascade", "config": label,
                      "ms_per_step": round(best / STEPS * 1e3, 2),
                      "fps": round(HB * STEPS / best)})
            except Exception as e:
                emit({"bench": "hand_cascade", "config": label,
                      "error": f"{type(e).__name__}: {e}"[:300]})

    log("done")


if __name__ == "__main__":
    main()
