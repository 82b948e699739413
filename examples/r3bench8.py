#!/usr/bin/env python3
"""Detect-cadence cost accounting for the production headline (round 3).

The production-cadence headline (12.94 ms/step at batch 128) sits ~4 ms/step
above the gate-isolation steady state (8.8-9.2, r3bench7) — implying ~36 ms
per forced-detection frame, yet the detect branch's parts measured ~9 ms in
isolation (letterbox 3.41 + BlazeFace CNN + decode/NMS; TODO_NEXT #2). This
script closes that gap with one honest program:

- ``cadence``: ONE compiled scan whose per-step ``force_detect`` flags are
  scan *data* (not trace-time constants), so the never/prod(1-in-9)/always
  arms time the SAME executable with different flag vectors — no compile
  variance between arms, detection cost = (always - never), and
  ``never + (always-never)/9`` must reconcile with the measured prod arm.
- ``detect``: components of ``FaceTracker._detect_batch`` at batch 128 —
  letterbox sampling alone, +CNN, the full branch (+decode+NMS), and the
  decode+NMS tail alone (pinned CNN outputs).

Usage: python examples/r3bench8.py [out.jsonl] [cadence detect]

Timing honesty: every window forces a device→host readback (np.asarray /
float()); jax.block_until_ready does NOT block through this tunnel
(CLAUDE.md). Reference cadence being modeled: the 300 ms redetect interval
at 30 fps (hand/tracking.rs:41).
"""

from __future__ import annotations

import os
import sys
import time

from _common import bench_log as log
from _common import make_bench_frame, make_emit, timed_windows

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3bench8.jsonl"
WHICH = set(sys.argv[2:]) or {"cadence", "detect"}

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

emit = make_emit(OUT)

B = int(os.environ.get("ZARU_TPU_R8_BATCH", "128"))
SCAN_STEPS = int(os.environ.get("ZARU_TPU_R8_SCAN", "18"))  # 2 detects at 1-in-9
ISO_STEPS = int(os.environ.get("ZARU_TPU_R8_ISO", "16"))
WINDOWS = int(os.environ.get("ZARU_TPU_R8_WINDOWS", "4"))


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

    tracker = FaceTracker()
    state0 = tracker.init_state(batch=B)
    state0, out = tracker.run_frames(state0, frames)
    assert bool(np.asarray(out["valid"]).all()), "tracking not established"

    results = {}

    if "cadence" in WHICH:
        @jax.jit
        def run_flags(params, st, frames, flags):
            def body(carry, force):
                st2, out = tracker.step_batch(params, carry, frames, force)
                return st2, jnp.sum(out["confidence"])

            _st, confs = lax.scan(body, st, flags)
            return jnp.sum(confs)

        arms = {
            "never": np.zeros(SCAN_STEPS, bool),
            "prod": (np.arange(SCAN_STEPS) % 9) == 0,
            "always": np.ones(SCAN_STEPS, bool),
        }
        for label, flags in arms.items():
            flags = jnp.asarray(flags)
            t0 = time.perf_counter()
            float(run_flags(tracker.params, state0, frames, flags))
            log(f"[cadence-{label}] compile+first: {time.perf_counter() - t0:.1f}s")
            best = float("inf")
            for _ in range(WINDOWS):
                t0 = time.perf_counter()
                float(run_flags(tracker.params, state0, frames, flags))
                best = min(best, time.perf_counter() - t0)
            ms = best * 1e3 / SCAN_STEPS
            results[label] = ms
            emit({
                "bench": "cadence", "arm": label, "batch": B,
                "scan": SCAN_STEPS, "ms_per_step": round(ms, 2),
                "fps": round(B * SCAN_STEPS / best, 0),
            })
        if {"never", "always", "prod"} <= results.keys():
            extra = results["always"] - results["never"]
            emit({
                "bench": "cadence", "arm": "derived",
                "detect_frame_extra_ms": round(extra, 2),
                "predicted_prod_ms": round(results["never"] + extra / 9, 2),
                "measured_prod_ms": round(results["prod"], 2),
            })

    if "detect" in WHICH:
        det_cnn = tracker.det_cnn
        res = det_cnn.input_resolution()
        from zaru_tpu.pipeline import _ops

        fits = jax.jit(
            jax.vmap(lambda f: _ops.full_frame_fit(f, res)[0])
        )(frames)
        rrects = jnp.concatenate(
            [fits, jnp.zeros((fits.shape[0], 1), jnp.float32)], axis=-1
        )
        np.asarray(rrects)

        def scan_iso(step):
            @jax.jit
            def run(params, frames, rr):
                def body(c, _):
                    out = step(params, frames, rr + c * 1e-6)
                    return c + 1.0, out
                _, outs = lax.scan(body, 0.0, None, length=ISO_STEPS)
                return outs
            return run

        def letterbox_only(params, frames, rr):
            xs = det_cnn.sample_views_letterbox(frames, rr)
            return jnp.sum(xs[:, 0, 0]) + jnp.sum(xs[:, -1, -1])

        def letterbox_cnn(params, frames, rr):
            xs = det_cnn.sample_views_letterbox(frames, rr)
            outs = jax.vmap(
                lambda t: det_cnn.apply_tensor_hwc(params["det"], t)
            )(xs)
            return sum(jnp.sum(o[..., 0]) for o in outs)

        def full_branch(params, frames, rr):
            # _detect_batch computes its own letterbox fit, so rr can't
            # carry the anti-CSE perturbation; thread it through a float
            # params leaf instead (c*1e-30 is numerically invisible but
            # defeats XLA's loop-invariant code motion — without it the
            # whole branch hoists out of the scan and times as ~cost/N).
            eps = jnp.sum(rr) * 1e-30
            p2 = {
                "det": jax.tree_util.tree_map(
                    lambda a: a + eps.astype(a.dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a,
                    params["det"],
                ),
                **{k: v for k, v in params.items() if k != "det"},
            }
            rois, founds = tracker._detect_batch(p2, frames)
            return jnp.sum(rois) + jnp.sum(founds)

        for label, step in (
            ("letterbox-only", letterbox_only),
            ("letterbox+cnn", letterbox_cnn),
            ("full-detect-branch", full_branch),
        ):
            dt = timed_windows(
                scan_iso(step), tracker.params, frames, rrects,
                n=WINDOWS, label=label,
            )
            emit({
                "bench": "detect_iso", "stage": label, "batch": B,
                "ms_per_step": round(dt / ISO_STEPS * 1e3, 2),
            })

        # decode+NMS tail alone, on pinned CNN outputs.
        xs = jax.jit(
            lambda fr, rr: det_cnn.sample_views_letterbox(fr, rr)
        )(frames, rrects)
        outputs0 = jax.jit(
            lambda p, xs: jax.vmap(
                lambda t: det_cnn.apply_tensor_hwc(p["det"], t)
            )(xs)
        )(tracker.params, xs)
        jax.block_until_ready(outputs0)
        np.asarray(outputs0[0][0, :1])

        @jax.jit
        def tail_only(outputs, fits):
            def body(c, _):
                outs = jax.tree_util.tree_map(
                    lambda o: o + c * 1e-6, list(outputs)
                )
                rois, founds = jax.vmap(
                    lambda o, f: tracker._detect_tail(o, f, res)
                )(outs, fits)
                return c + 1.0, jnp.sum(rois) + jnp.sum(founds)
            _, accs = lax.scan(body, 0.0, None, length=ISO_STEPS)
            return accs

        dt = timed_windows(tail_only, outputs0, fits, n=WINDOWS,
                           label="decode+nms-tail")
        emit({
            "bench": "detect_iso", "stage": "decode+nms-tail", "batch": B,
            "ms_per_step": round(dt / ISO_STEPS * 1e3, 2),
        })

    log("done")


if __name__ == "__main__":
    main()
