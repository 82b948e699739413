#!/usr/bin/env python3
"""Round-3 TPU batch 4: hand-sampler regression hunt.

The hand cascade measures ~48 ms/step (64x4 slots) vs round 2's 28.5 —
the rolled M=256 sampler path regressed somewhere in the u32 rework.
Variants isolate: prescale impl, rolled vs banded vs plain full-band,
fused vs per-channel selection matmuls.

Usage: python examples/r3bench4.py [out.jsonl]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3bench4.jsonl"

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from zaru_tpu.ops.rotated_fast import rotated_sample_fast  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(rec):
    rec = dict(rec, t=round(time.time()))
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log("RESULT", json.dumps(rec))


B, S = 64, 4
STEPS = 8


def main():
    import cv2

    from zaru_tpu.assets import fixture_path
    from zaru_tpu.image import decode as idec

    log(f"on {jax.devices()[0].device_kind}")
    rgb = idec.load_image(fixture_path("sad_linus.jpg"))[..., :3]
    frame = cv2.resize(rgb, (1920, 1080), interpolation=cv2.INTER_LINEAR)
    frame = np.concatenate(
        [frame, np.full((1080, 1920, 1), 255, np.uint8)], axis=-1
    )
    frames = jax.jit(
        lambda f: jnp.broadcast_to(f[None], (B, *f.shape)) + 0
    )(jax.device_put(jnp.asarray(frame)))
    np.asarray(frames[0, 0, 0])

    rng = np.random.default_rng(3)
    rois = np.stack([
        np.stack([
            rng.uniform(300, 1600, S), rng.uniform(200, 900, S),
            rng.uniform(180, 320, S), rng.uniform(180, 320, S),
            rng.uniform(-3.0, 3.0, S),
        ], axis=-1)
        for _ in range(B)
    ]).astype(np.float32)
    # aspect-square views like the cascade produces
    side = np.maximum(rois[..., 2], rois[..., 3])
    rois[..., 2] = rois[..., 3] = side
    rois_dev = jnp.asarray(rois)

    def run_variant(label, **opts):
        @jax.jit
        def run(fr, rr):
            def body(c, _):
                out = rotated_sample_fast(
                    fr, rr + c * 1e-6, 224, 224, 0.0, 1.0, **opts
                )
                return c + 1.0, out[:, 0, 0, 0, 0]

            _, o = lax.scan(body, 0.0, None, length=STEPS)
            return o

        try:
            t0 = time.perf_counter()
            np.asarray(run(frames, rois_dev))
            log(f"[{label}] compile {time.perf_counter() - t0:.1f}s")
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                np.asarray(run(frames, rois_dev))
                best = min(best, time.perf_counter() - t0)
            emit({"bench": "hand_sampler", "config": label,
                  "ms_per_step": round(best / STEPS * 1e3, 2)})
        except Exception as e:
            emit({"bench": "hand_sampler", "config": label,
                  "error": f"{type(e).__name__}: {e}"[:200]})

    M256 = dict(prescale_m=256, band_p=256, col_split=1)
    run_variant("rolled (hand default)", square_views=True, **M256)
    run_variant("rolled fuse3=off", square_views=True, fuse3=False, **M256)
    run_variant("rolled take-prescale", square_views=True,
                pallas_prescale=False, **M256)
    run_variant("plain full-band M256", **M256)
    run_variant("banded auto M256", prescale_m=256)
    run_variant("banded auto M256 rpb8", prescale_m=256, rows_per_block=8)
    run_variant("banded auto M512 (face-style)")
    log("done")


if __name__ == "__main__":
    main()
