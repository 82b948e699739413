#!/usr/bin/env python3
"""Round-3 TPU batch 3: the VMEM-resident BlazeBlock stage kernel vs XLA.

Measures, at batch 128 f32, each FaceMesh residual stage's 2-block chain
(ops/cnn_stage.py) against the XLA lowering of the same chain — the
go/no-go experiment for VERDICT r2 next-step #4 (multi-layer megakernel,
est <= 2x on the ~6 ms CNN slice).

Usage: python examples/r3bench3.py [out.jsonl]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3bench3.jsonl"

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from zaru_tpu.ops.cnn_stage import (  # noqa: E402
    blaze_blocks_reference, fused_blocks, pack_blocks,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(rec):
    rec = dict(rec, t=round(time.time()))
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log("RESULT", json.dumps(rec))


B = 128
STEPS = 32

# FaceMesh stage shapes (face_landmark.onnx): (C, H, W, n_blocks, groups)
STAGES = [
    (16, 96, 96, 2, (2, 4)),
    (32, 48, 48, 2, (2, 4)),
    (64, 24, 24, 2, (1, 2)),
    (128, 12, 12, 2, (1,)),
    (128, 6, 6, 2, (1,)),
]


def make_blocks(rng, C, nb):
    return [
        {
            "dw_w": rng.normal(0, 0.3, (C, 1, 3, 3)).astype(np.float32),
            "dw_b": rng.normal(0, 0.1, (C,)).astype(np.float32),
            "pw_w": rng.normal(0, 0.3, (C, C, 1, 1)).astype(np.float32),
            "pw_b": rng.normal(0, 0.1, (C,)).astype(np.float32),
            "alpha": rng.uniform(0.05, 0.3, (C,)).astype(np.float32),
        }
        for _ in range(nb)
    ]


def timed(fn, *args, label=""):
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    log(f"[{label}] compile+first {time.perf_counter() - t0:.1f}s")
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
        log(f"[{label}] window {best * 1e3:.1f} ms best")
    return best / STEPS * 1e3  # ms per scan step


def gate_isolation():
    """Where do the cascade's ~25 ms go beyond the 17.5 ms landmark
    half? Time step_batch with the gate always taking the track-only
    branch (all streams tracking, no forced detect)."""
    import cv2

    from zaru_tpu.assets import fixture_path
    from zaru_tpu.image import decode as idec
    from zaru_tpu.pipeline import FaceTracker

    rgb = idec.load_image(fixture_path("sad_linus.jpg"))[..., :3]
    frame = cv2.resize(rgb, (1920, 1080), interpolation=cv2.INTER_LINEAR)
    frame = np.concatenate(
        [frame, np.full((1080, 1920, 1), 255, np.uint8)], axis=-1
    )
    frames = jax.jit(
        lambda f: jnp.broadcast_to(f[None], (B, *f.shape)) + 0
    )(jax.device_put(jnp.asarray(frame)))
    np.asarray(frames[0, 0, 0])

    tracker = FaceTracker()
    state = tracker.init_state(batch=B)
    state, _ = jax.jit(
        lambda p, s, f: tracker.step_batch(p, s, f, True)
    )(tracker.params, state, frames)
    np.asarray(state["roi"])

    @jax.jit
    def run(params, state, fr):
        def body(st, _):
            st, out = tracker.step_batch(params, st, fr, False)
            return st, out["confidence"]

        return lax.scan(body, state, None, length=STEPS)

    t0 = time.perf_counter()
    _s, confs = run(tracker.params, state, frames)
    np.asarray(confs)
    log(f"[gate-steady] compile {time.perf_counter() - t0:.1f}s")
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        _s, confs = run(tracker.params, state, frames)
        np.asarray(confs)
        best = min(best, time.perf_counter() - t0)
        log(f"[gate-steady] window {best * 1e3:.0f} ms best")
    emit({"bench": "cascade_steady_no_detect",
          "ms_per_step": round(best / STEPS * 1e3, 2),
          "fps": round(B * STEPS / best),
          "tracked": float(np.asarray(confs)[-1].min())})


def main():
    dev = jax.devices()[0]
    log(f"on {dev.platform} ({dev.device_kind})")
    gate_isolation()
    rng = np.random.default_rng(0)

    for C, H, W, nb, groups in STAGES:
        blocks = make_blocks(rng, C, nb)
        x = jnp.asarray(rng.normal(0, 1, (B, C, H, W)).astype(np.float32))

        @jax.jit
        def run_xla(x):
            def body(c, _):
                out = blaze_blocks_reference(x + c * 1e-6, blocks)
                return c + 1.0, out[:, 0, 0, 0]

            _, o = lax.scan(body, 0.0, None, length=STEPS)
            return o

        ms_xla = timed(run_xla, x, label=f"xla C{C} {H}x{W}")
        emit({"bench": "stage", "impl": "xla", "C": C, "H": H,
              "nb": nb, "ms_per_step": round(ms_xla, 3)})

        for G in groups:
            packed = pack_blocks(blocks, C, G)

            @jax.jit
            def run_fused(x, packed=packed, G=G):
                def body(c, _):
                    out = fused_blocks(
                        x + c * 1e-6, packed, H, W, C, group=G
                    )
                    return c + 1.0, out[:, 0, 0, 0]

                _, o = lax.scan(body, 0.0, None, length=STEPS)
                return o

            try:
                ms = timed(run_fused, x, label=f"fused C{C} G{G}")
                # On-device correctness spot check.
                got = np.asarray(fused_blocks(x, packed, H, W, C, group=G))
                want = np.asarray(blaze_blocks_reference(x, blocks))
                err = float(np.abs(got - want).max())
                emit({"bench": "stage", "impl": f"fused_g{G}", "C": C,
                      "H": H, "nb": nb, "ms_per_step": round(ms, 3),
                      "max_err": err, "speedup_vs_xla":
                      round(ms_xla / ms, 2)})
            except Exception as e:
                emit({"bench": "stage", "impl": f"fused_g{G}", "C": C,
                      "H": H, "error": f"{type(e).__name__}: {e}"[:300]})

    log("done")


if __name__ == "__main__":
    main()
