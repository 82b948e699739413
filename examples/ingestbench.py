#!/usr/bin/env python3
"""Host-ingest measurement: JPEG decode scaling, host→device upload, and
the decode→upload→cascade e2e loop (SURVEY §7's 2,000×1080p ingress hard
part; VERDICT r2 missing #5).

Two very different links exist:
- decode throughput is a property of THIS host's CPU (representative);
- upload bandwidth here crosses a remote TPU tunnel (NOT representative
  of a co-located host's PCIe) — recorded honestly and labeled as such.

Usage: python examples/ingestbench.py [out.jsonl] [sections...]
  sections ∈ {decode, upload, e2e} (default: all; `upload`/`e2e` need
  the TPU tunnel and real minutes — decode is pure host CPU).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ingestbench.jsonl"
WHICH = set(sys.argv[2:]) or {"decode", "upload", "e2e"}

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(rec):
    rec = dict(rec, t=round(time.time()))
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log("RESULT", json.dumps(rec))


def make_1080p_jpeg(quality=90) -> bytes:
    import cv2

    from zaru_tpu.assets import fixture_path
    from zaru_tpu.image import decode as idec

    rgb = idec.load_image(fixture_path("sad_linus.jpg"))[..., :3]
    frame = cv2.resize(rgb, (1920, 1080), interpolation=cv2.INTER_LINEAR)
    ok, enc = cv2.imencode(
        ".jpg", cv2.cvtColor(frame, cv2.COLOR_RGB2BGR),
        [cv2.IMWRITE_JPEG_QUALITY, quality],
    )
    assert ok
    return enc.tobytes()


def main():
    blob = make_1080p_jpeg()
    log(f"1080p jpeg: {len(blob) / 1024:.0f} KiB")

    if "decode" in WHICH:
        from zaru_tpu.image.decode import DecodePool, decode_jpeg

        # Single-thread baseline per backend.
        for backend in ("cv2", "native"):
            os.environ["ZARU_TPU_JPEG_BACKEND"] = backend
            try:
                decode_jpeg(blob)
            except Exception as e:
                log(f"backend {backend} unavailable: {e}")
                continue
            n = 40
            t0 = time.perf_counter()
            for _ in range(n):
                decode_jpeg(blob)
            dt = time.perf_counter() - t0
            emit({"bench": "decode_1thread", "backend": backend,
                  "ms_per_frame": round(dt / n * 1e3, 2),
                  "fps": round(n / dt, 1)})

        # Thread-pool scaling (native/libjpeg backend, GIL released during
        # the C decode). On a single-core host (this box) the pool can
        # only show no-regression; the per-core fps above is the
        # extrapolation basis for a co-located many-core host.
        os.environ["ZARU_TPU_JPEG_BACKEND"] = "native"
        ncpu = os.cpu_count() or 1
        for threads in sorted({2, 4, min(8, max(2, ncpu)), ncpu} | {ncpu}):
            if threads > max(2 * ncpu, 4):
                break
            pool = DecodePool(threads)
            blobs = [blob] * (threads * 10)
            # Full-size warm round: the first full batch pays one-time
            # allocator growth/page faults for the result arrays (~4 s
            # measured for 10 1080p frames on this box) — steady state
            # is what an ingest loop sees.
            pool.decode_batch(blobs)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                pool.decode_batch(blobs)
                best = min(best, time.perf_counter() - t0)
            pool.close()
            emit({"bench": "decode_pool", "threads": threads,
                  "fps": round(len(blobs) / best, 1),
                  "ncpu": ncpu})

    if "upload" in WHICH or "e2e" in WHICH:
        import jax
        import jax.numpy as jnp

        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        )
        dev = jax.devices()[0]
        log(f"device: {dev.platform} ({dev.device_kind})")
        link = "tunnel" if dev.platform != "cpu" else "local"

    if "upload" in WHICH:
        from zaru_tpu.pipeline.ingest import measure_ingest_bandwidth

        for batch in (8, 32):
            r = measure_ingest_bandwidth(batch=batch, iters=6)
            emit({"bench": "upload", "batch": batch, "link": link,
                  "gbytes_per_s": round(r["gbytes_per_s"], 3),
                  "frames_per_s": round(r["frames_per_s"], 1)})

    if "e2e" in WHICH:
        # decode (thread pool) -> FrameUploader -> gated cascade, batch 8:
        # the full host-fed serving loop. On the tunnel the upload wall
        # dominates; the decode/compute columns still split out.
        import cv2

        from zaru_tpu.image.decode import DecodePool
        from zaru_tpu.pipeline import FaceTracker
        from zaru_tpu.pipeline.ingest import FrameUploader

        B = 8
        pool = DecodePool(8)
        up = FrameUploader(batch=B, shape=(1080, 1920, 4))
        tracker = FaceTracker()
        state = tracker.init_state(batch=B)

        def stage_batch():
            t0 = time.perf_counter()
            frames = pool.decode_batch([blob] * B)
            t_dec = time.perf_counter() - t0
            for i, f in enumerate(frames):
                # One-pass conversion: the BGRA+fancy-index form paid an
                # extra full-frame copy per staged frame in the hot loop.
                up.stage(i, cv2.cvtColor(f, cv2.COLOR_RGB2RGBA))
            return t_dec

        # Warm: compile the gated program + first upload.
        stage_batch()
        frames_dev = up.flush()
        state, out = tracker.run_frames_gated(state, frames_dev)
        np.asarray(out["confidence"])

        iters = 6
        t_dec_total = 0.0
        t0 = time.perf_counter()
        for _ in range(iters):
            t_dec_total += stage_batch()
            frames_dev = up.flush()
            state, out = tracker.run_frames_gated(state, frames_dev)
            np.asarray(out["confidence"])
        dt = time.perf_counter() - t0
        emit({
            "bench": "e2e_ingest_cascade", "batch": B, "link": link,
            "fps": round(B * iters / dt, 1),
            "decode_ms_per_batch": round(t_dec_total / iters * 1e3, 1),
            "tracked": float(np.asarray(out["confidence"]).min()),
        })

    log("done")


if __name__ == "__main__":
    main()
