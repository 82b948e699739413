"""Micro-benchmark: the three batched cascade paths.

Quantifies the batch-level detection-gate tradeoff documented in
pipeline/face_cascade.py step_batch (round-1 VERDICT weak #3 / next #8):

- ``vmap``           — per-stream lax.cond over exact sampling (both
                       branch bodies execute under vmap; detection cost
                       paid every frame) — the pre-round-2 architecture,
- ``gated``          — batch-scalar gate + MXU fast sampler (landmark-only
                       while ALL streams track; full frame otherwise),
- ``gated-worst``    — gated path with one stream permanently lost
                       (detection for all streams every frame),
- ``landmark-only``  — lower bound of the fast path (no detection ever),
- ``landmark-exact`` — same but per-stream exact gather (the sampler
                       tradeoff in isolation).

Usage: python examples/gatebench.py [batch ...]   (default: 8 128)
Writes one result line per (batch, path): steady-state frames/sec over a
scan-amortized window, best of WINDOWS. Run on a quiet chip — the shared
tunnel's throttle flattens all paths to the same wall-clock cap.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

SCAN_STEPS = int(os.environ.get("ZARU_TPU_GATE_SCAN", "32"))
WINDOWS = int(os.environ.get("ZARU_TPU_GATE_WINDOWS", "4"))


def main():
    # Env var alone is not honored under the axon sitecustomize
    # (CLAUDE.md); honor JAX_PLATFORMS=cpu like the sibling benches.
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    from zaru_tpu.pipeline import FaceTracker

    batches = [int(a) for a in sys.argv[1:]] or [8, 128]
    from zaru_tpu.bench_programs import make_1080p_frame  # realistic frame

    frame = make_1080p_frame()
    print(f"device: {jax.devices()[0].device_kind}; scan={SCAN_STEPS}, "
          f"windows={WINDOWS}", file=sys.stderr)

    for batch in batches:
        tracker = FaceTracker()
        frame_dev = jax.device_put(jnp.asarray(frame))
        frames = jax.jit(
            lambda f: jnp.broadcast_to(f[None], (batch, *f.shape)) + 0
        )(frame_dev)
        jax.block_until_ready(frames)
        state = tracker.init_state(batch=batch)
        state, out = tracker.run_frames(state, frames)  # establish tracking
        assert bool(np.asarray(out["valid"]).all()), "tracking not established"

        lost_state = dict(state, tracking=state["tracking"].at[0].set(False))

        def scan_of(step_fn, init):
            @jax.jit
            def run(params, st, frames):
                def body(carry, _):
                    st, out = step_fn(params, carry, frames)
                    return st, jnp.sum(out["confidence"])

                _st, confs = lax.scan(body, st, jnp.arange(SCAN_STEPS))
                return jnp.sum(confs)

            return run, init

        def landmark_only_step(params, st, frames):
            seeded = jnp.zeros_like(st["tracking"])
            return tracker._track_batch(params, st, frames, st["roi"], seeded)

        def landmark_only_exact_step(params, st, frames):
            def one(s, f):
                return tracker._track(params, s, f, s["roi"], jnp.asarray(False))

            return jax.vmap(one, in_axes=(0, 0))(st, frames)

        def gated_worst_step(params, st, frames):
            st2, out = tracker.step_batch(params, st, frames)
            # Re-lose stream 0 so every frame takes the full branch.
            st2 = dict(st2, tracking=st2["tracking"].at[0].set(False))
            return st2, out

        paths = {
            "vmap": scan_of(
                jax.vmap(tracker.step, in_axes=(None, 0, 0)).__call__, state
            ),
            "gated": scan_of(tracker.step_batch, state),
            "gated-worst": scan_of(gated_worst_step, lost_state),
            "landmark-only": scan_of(landmark_only_step, state),
            "landmark-exact": scan_of(landmark_only_exact_step, state),
        }

        for name, (run, init) in paths.items():
            # float() forces a real readback: block_until_ready does not
            # block through the axon tunnel (BENCHMARKS.md).
            float(run(tracker.params, init, frames))  # compile
            best = 0.0
            for _ in range(WINDOWS):
                t0 = time.perf_counter()
                float(run(tracker.params, init, frames))
                best = max(
                    best, batch * SCAN_STEPS / (time.perf_counter() - t0)
                )
            print(f"batch {batch:4d}  {name:14s} {best:12.0f} fps")


if __name__ == "__main__":
    main()
