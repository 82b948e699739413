"""Micro-benchmark: the fused multi-face cascade's steady-state throughput.

`pipeline.MultiFaceTracker` (fixed-slot multi-face per stream — beyond the
reference, whose examples track one face) shares the `MultiObjectTracker`
machinery with the hand cascade; this pins its device cost so BENCHMARKS
has a measured row for every fused pipeline. Slots hold synthetic
face-sized rotated ROIs (the step cost is shape-dependent, not
content-dependent) with `loss_threshold=0` keeping them alive, so the
gated step measures the steady landmark state at production cadence off
the detect frame.

Usage: python examples/multifacebench.py [batch [slots [arms]]]
(default 64 4; ``arms`` = comma-separated subset of
gated,sample-slots,lm-cnn,track-slots — the isolation arms bisect the
per-face cost the same way handbench does for hands)

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

SCAN_STEPS = int(os.environ.get("ZARU_TPU_MFB_SCAN", "8"))
WINDOWS = int(os.environ.get("ZARU_TPU_MFB_WINDOWS", "4"))


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))

    from zaru_tpu.pipeline import MultiFaceTracker
    from zaru_tpu.bench_programs import make_1080p_frame

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    frame = make_1080p_frame()
    print(f"device: {jax.devices()[0].device_kind}; batch={batch}x{slots}, "
          f"scan={SCAN_STEPS}, windows={WINDOWS}", file=sys.stderr)

    tracker = MultiFaceTracker(max_faces=slots, loss_threshold=0.0)
    if os.environ.get("ZARU_TPU_MFB_ROLLED"):
        # A/B: the hand cascade's rolled full-band config (valid here too:
        # FaceMeshV1 views are square). sampler_opts is read at trace
        # time, so overriding before the first jit call is effective.
        tracker.sampler_opts = {
            "prescale_m": 256, "band_p": 256, "col_split": 1,
            "square_views": True,
        }
        print("sampler: rolled full-band M=256", file=sys.stderr)
    params = tracker.params
    frame_dev = jax.device_put(jnp.asarray(frame))
    frames = jax.jit(
        lambda f: jnp.broadcast_to(f[None], (batch, *f.shape)) + 0
    )(frame_dev)
    np.asarray(frames[0, 0, 0])

    rng = np.random.default_rng(3)
    rois_np = np.stack(
        [
            np.stack(
                [
                    rng.uniform(300, 1600, slots),   # cx
                    rng.uniform(200, 900, slots),    # cy
                    rng.uniform(200, 500, slots),    # face-sized w
                    rng.uniform(200, 500, slots),    # h
                    rng.uniform(-3.0, 3.0, slots),   # any rotation
                ],
                axis=-1,
            )
            for _ in range(batch)
        ]
    ).astype(np.float32)
    state = tracker.init_state(batch=batch)
    state = dict(
        state,
        rois=jnp.asarray(rois_np),
        active=jnp.ones((batch, slots), bool),
        frame=jnp.ones((batch,), jnp.int32),  # off the detect cadence
    )

    rois = state["rois"]

    def scan_of(fn, carry0):
        @jax.jit
        def run(frames, carry0):
            def body(carry, _):
                outv, carry = fn(frames, carry)
                return carry, jnp.sum(outv)

            _c, sums = lax.scan(body, carry0, jnp.arange(SCAN_STEPS))
            return jnp.sum(sums)

        return lambda: float(run(frames, carry0))

    lm_cnn = tracker.lm_cnn

    def gated(frames, st):
        st, out = tracker.step_batch(params, st, frames)
        return out["confidence"], st

    def sample_slots(frames, rrs):
        xs = lm_cnn.sample_views_fast(frames, rrs, **tracker.sampler_opts)
        s = jnp.sum(xs)
        return xs, rrs + 1e-30 * s

    res = lm_cnn.input_resolution()
    from zaru_tpu.pipeline import _ops

    view_rects = jax.jit(
        jax.vmap(jax.vmap(lambda r: _ops.aspect_view_rect(r, res)))
    )(rois)
    xs0 = jax.jit(
        lambda f: lm_cnn.sample_views_fast(f, view_rects, **tracker.sampler_opts)
    )(frames)
    np.asarray(xs0[0, 0, 0, 0])

    def lm_cnn_only(frames, xs):
        # DELIBERATELY nested vmap: this arm is the preserved
        # measured-negative record of the two-batch-dim conv lowering
        # (~4.5x slower; see BENCHMARKS.md "Nested vmap over CNNs").
        # The production path flattens [B,S]->[B*S]
        # (multi_object._track_slots_batch); do not "fix" this arm.
        outs = jax.vmap(
            jax.vmap(lambda t: lm_cnn.apply_tensor_hwc(params["lm"], t))
        )(xs)
        s = jnp.sum(outs[0])
        return outs[0], xs + 1e-30 * s

    def track_slots(frames, rrs):
        new_rois, conf, _extras, _pos = tracker._track_slots_batch(
            params, frames, rrs
        )
        return conf, rrs + 1e-30 * jnp.sum(conf)

    paths = {
        "gated": scan_of(gated, state),
        "sample-slots": scan_of(sample_slots, view_rects),
        "lm-cnn": scan_of(lm_cnn_only, xs0),
        "track-slots": scan_of(track_slots, rois),
    }
    if len(sys.argv) > 3:
        wanted = set(sys.argv[3].split(","))
        unknown = wanted - set(paths)
        if unknown:
            sys.exit(f"unknown arms {sorted(unknown)}; have {sorted(paths)}")
        paths = {k: v for k, v in paths.items() if k in wanted}
    for name, run in paths.items():
        t0 = time.perf_counter()
        run()  # compile
        print(f"[{name}] compile+first: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        best = float("inf")
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            run()
            best = min(best, (time.perf_counter() - t0) / SCAN_STEPS)
        print(f"batch {batch:3d}x{slots}  {name:13s} {best*1e3:8.2f} ms/step "
              f"({batch / best:.0f} fps, {batch * slots / best:.0f} faces/s)")


if __name__ == "__main__":
    main()
