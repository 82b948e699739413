#!/usr/bin/env python3
"""Prescale crop-DMA double-buffering A/B (round 3).

The Pallas prescale kernel serialized its per-view crop DMA with the
selection matmuls (cp.start(); cp.wait()); the double-buffered variant
prefetches view v+1's crop during view v's compute. At batch 128 /
stride 2 the serialized DMA is ~0.9 ms/step (128 x 5.5 MB at HBM bw),
so the win should be most of that. This batch measures, on device:

- parity: auto-dbuf == take path bit-exact per stride class (the
  kernel body changed; ADVICE r2 #4's device-pinning rule applies).
  The stride-1 case must have bbox <= 512: a 420 px view at theta=0.3
  inflates to a 527 px bbox = stride 2 (the first run of this script
  mislabeled exactly that), so 400 px (bbox ~502) is used;
- stages: prescale-only isolation, dbuf 0 vs 1 (face stride-2 shape);
- sampler: full face-default sampler (banded xroll), dbuf 0 vs 1, at
  stride 2 (836 px upright) and stride 1 (360 px). dbuf is a STATIC
  kwarg (prescale_dbuf) — an env knob read inside the traced function
  was invisible to jit's cache and made the first A/B's sampler arms
  measure the same program twice.

- faceconfig: proven face blockings A/B after the rpb=64 retraction
  (the x-window proof omitted rows_per_block; BENCHMARKS "CORRECTION"):
  auto (cs=6/rpb=32/XW=128, 36 blocks) vs the proven candidate
  cs=3/rpb=64/XW=256 (9 blocks, 2x contraction width), upright and at
  theta=1.0, plus the production-cadence cascade with the winner's
  default.

Usage: python examples/r3bench6.py [out.jsonl] [which ...]
  which ∈ {parity, stages, sampler, faceconfig} (default: all)

Timing honesty: every window forces a device→host readback (np.asarray);
jax.block_until_ready does NOT block through this tunnel (CLAUDE.md).
"""

from __future__ import annotations

import os
import sys
import time

# _common honors JAX_PLATFORMS=cpu (the axon sitecustomize ignores the
# env var alone) and puts the repo root on sys.path.
from _common import bench_log as log  # noqa: F401
from _common import make_bench_frame, make_emit, timed_windows

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3bench6.jsonl"
WHICH = set(sys.argv[2:]) or {"parity", "stages", "sampler", "faceconfig"}

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

emit = make_emit(OUT)

B = 128
STEPS = 16


def main():
    dev = jax.devices()[0]
    log(f"on {dev.platform} ({dev.device_kind})")
    frame = make_bench_frame()
    frame_dev = jax.device_put(jnp.asarray(frame))
    frames = jax.jit(
        lambda f: jnp.broadcast_to(f[None], (B, *f.shape)) + 0
    )(frame_dev)
    np.asarray(frames[0, 0, 0])

    def rects(theta, size=836.0):
        rr = np.zeros((B, 5), np.float32)
        rr[:] = [1038.0, 595.0, size, size, theta]
        return jnp.asarray(rr)

    from zaru_tpu.ops.rotated_fast import rotated_sample_fast

    if "parity" in WHICH:
        from zaru_tpu.ops.rotated_fast import (
            PRESCALE_M, _prescale_coverage_ok,
        )

        img = np.asarray(frame[None])
        cfg = dict(
            out_w=192, out_h=192, lo=0.0, hi=255.0,
            band_p=192, rows_per_block=64, win_x=128, xroll=True,
        )
        for size, theta, cls in (
            (400.0, 0.3, 1), (700.0, 0.9, 2), (836.0, 1.0, 3),
        ):
            rr = jnp.asarray(
                np.asarray([[960, 540, size, size, theta]], np.float32)
            )
            # Guard against the class-misattribution bug this section
            # once had: the case must be admitted by ITS class and
            # rejected by the tighter one, or the record lies.
            admitted = bool(
                _prescale_coverage_ok(rr, PRESCALE_M, 1080, 1920, cls)
            )
            tighter = cls > 1 and bool(
                _prescale_coverage_ok(rr, PRESCALE_M, 1080, 1920, cls - 1)
            )
            via_pallas = np.asarray(
                rotated_sample_fast(
                    jnp.asarray(img), rr, **cfg, pallas_prescale=True
                )
            )
            via_take = np.asarray(
                rotated_sample_fast(
                    jnp.asarray(img), rr, **cfg, pallas_prescale=False
                )
            )
            emit({
                "check": "device_parity_dbuf", "smax": cls,
                "size": size, "theta": theta,
                "class_admits": admitted, "tighter_admits": tighter,
                "pallas_eq_take": bool((via_pallas == via_take).all()),
                "max_abs_diff": float(np.abs(via_pallas - via_take).max()),
            })

    if "stages" in WHICH:
        from zaru_tpu.ops.rotated_fast import PRESCALE_M, _prescale_pallas

        img32 = jax.jit(
            lambda f: lax.bitcast_convert_type(f, jnp.uint32)
        )(frames)
        np.asarray(img32[0, 0])

        def make_prescale(dbuf):
            @jax.jit
            def run_pallas(fr32, rr):
                def body(c, _):
                    pl_ = _prescale_pallas(
                        fr32, rr + c * 1e-6, PRESCALE_M, 1, False, 2, dbuf
                    )
                    return c + 1.0, pl_[:, 0, 0]

                _, outs = lax.scan(body, 0.0, None, length=STEPS)
                return outs

            return run_pallas

        for dbuf in (False, True):
            dt = timed_windows(
                make_prescale(dbuf), img32, rects(0.12),
                label=f"prescale-dbuf{int(dbuf)}",
            )
            emit({"bench": "prescale_only", "dbuf": dbuf,
                  "ms_per_step": round(dt / STEPS * 1e3, 2)})

    if "sampler" in WHICH:
        def make_sampler(dbuf):
            @jax.jit
            def run(fr, rr):
                def body(c, _):
                    out = rotated_sample_fast(
                        fr, rr + c * 1e-6, 192, 192, 0.0, 1.0,
                        pallas_prescale=True, prescale_dbuf=dbuf,
                        band_p=192, rows_per_block=64, win_x=128,
                        xroll=True,
                    )
                    return c + 1.0, out[:, 0, 0, 0]

                _, outs = lax.scan(body, 0.0, None, length=STEPS)
                return outs

            return run

        for size, lbl in ((836.0, "836px s2"), (360.0, "360px s1")):
            for dbuf in (False, True):
                dt = timed_windows(
                    make_sampler(dbuf), frames, rects(0.12, size),
                    label=f"sampler {lbl} dbuf{int(dbuf)}",
                )
                emit({"bench": "sampler_dbuf", "config": lbl,
                      "dbuf": dbuf,
                      "ms_per_step": round(dt / STEPS * 1e3, 2),
                      "fps": round(B * STEPS / dt)})

    if "faceconfig" in WHICH:
        CANDIDATE = dict(
            band_p=192, col_split=3, rows_per_block=64, win_x=256,
            xroll=True,
        )

        def make_cfg(opts):
            @jax.jit
            def run(fr, rr):
                def body(c, _):
                    out = rotated_sample_fast(
                        fr, rr + c * 1e-6, 192, 192, 0.0, 1.0,
                        pallas_prescale=True, **opts,
                    )
                    return c + 1.0, out[:, 0, 0, 0]

                _, outs = lax.scan(body, 0.0, None, length=STEPS)
                return outs

            return run

        for label, opts in (("auto", {}), ("cs3-xw256", CANDIDATE)):
            for theta in (0.12, 1.0):
                dt = timed_windows(
                    make_cfg(opts), frames, rects(theta),
                    label=f"face {label} theta={theta}",
                )
                emit({"bench": "face_config", "config": label,
                      "theta": theta,
                      "ms_per_step": round(dt / STEPS * 1e3, 2),
                      "fps": round(B * STEPS / dt)})

        # Production cadence with the shipped default (auto) — the
        # headline re-measurement after the retraction.
        from zaru_tpu.pipeline import FaceTracker

        tracker = FaceTracker()
        state = tracker.init_state(batch=B)

        @jax.jit
        def run_cascade(params, state, fr):
            def body(st, t):
                st, out = tracker.step_batch(params, st, fr, t % 9 == 0)
                return st, out["confidence"]

            return lax.scan(body, state, jnp.arange(STEPS))

        t0 = time.perf_counter
        tt = t0()
        state, confs = run_cascade(tracker.params, state, frames)
        confs = np.asarray(confs)
        log(f"[cascade] compile+detect {t0() - tt:.1f}s "
            f"conf {confs[-1].min():.2f}")
        best = float("inf")
        for _ in range(5):
            tt = t0()
            _s, confs = run_cascade(tracker.params, state, frames)
            np.asarray(confs)
            best = min(best, t0() - tt)
            log(f"[cascade] window {best * 1e3:.0f} ms best")
        emit({"bench": "cascade_production", "config": "auto default",
              "ms_per_step": round(best / STEPS * 1e3, 2),
              "fps": round(B * STEPS / best),
              "tracked": float(confs[-1].min())})

    log("done")


if __name__ == "__main__":
    main()
