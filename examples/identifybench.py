"""Micro-benchmark: the fused identification pipeline's device cost.

`face.identify.StreamIdentifier` (beyond the reference, whose recognition
is a host-side eval example — eval_face_recognition.rs:44-90) runs
track + embed + 1:N gallery match for every stream in the same jitted
step. This pins its throughput and the marginal cost of the identify
stage over the bare face cascade at batch B with a G-row gallery.

Usage: python examples/identifybench.py [batch [gallery_rows]]
(default 128 512)

Timing honesty: every window forces a real device→host readback
(CLAUDE.md: block_until_ready does not block through the tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax

SCAN_STEPS = int(os.environ.get("ZARU_TPU_IDB_SCAN", "8"))
WINDOWS = int(os.environ.get("ZARU_TPU_IDB_WINDOWS", "4"))


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))

    from zaru_tpu.face.identify import StreamIdentifier
    from zaru_tpu.bench_programs import make_1080p_frame

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    gallery_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    frame = make_1080p_frame()
    print(f"device: {jax.devices()[0].device_kind}; batch={batch}, "
          f"gallery={gallery_rows}, scan={SCAN_STEPS}", file=sys.stderr)

    sid = StreamIdentifier()
    rng = np.random.default_rng(7)
    sid.set_gallery(
        [f"id{i}" for i in range(gallery_rows)],
        rng.normal(size=(gallery_rows, 128)).astype(np.float32),
    )
    frame_dev = jax.device_put(jnp.asarray(frame))
    frames = jax.jit(
        lambda f: jnp.broadcast_to(f[None], (batch, *f.shape)) + 0
    )(frame_dev)
    np.asarray(frames[0, 0, 0])

    state = sid.init_state(batch=batch)
    state, out = sid.run_frames(state, frames)
    assert bool(np.asarray(out["valid"]).all()), "tracking not established"

    arms = {
        "identify": lambda st, fr: sid.step(
            sid.params, st, fr, sid._gallery, sid.threshold
        ),
        "track-only": lambda st, fr: sid.tracker.step_batch(
            sid.params, st, fr
        ),
    }
    for name, step in arms.items():
        @jax.jit
        def run(params, st, frames, _step=step):
            def body(carry, _):
                st2, out = _step(carry, frames)
                return st2, jnp.sum(out["confidence"])

            _c, sums = lax.scan(body, st, jnp.arange(SCAN_STEPS))
            return jnp.sum(sums)

        t0 = time.perf_counter()
        float(run(sid.params, state, frames))
        print(f"[{name}] compile+first: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        best = float("inf")
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            float(run(sid.params, state, frames))
            best = min(best, (time.perf_counter() - t0) / SCAN_STEPS)
        print(f"batch {batch:3d} G={gallery_rows}  {name:10s} "
              f"{best*1e3:8.2f} ms/step ({batch / best:.0f} fps)")


if __name__ == "__main__":
    main()
