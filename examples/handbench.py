"""Micro-benchmark: the fused multi-hand cascade's cost split.

The hand cascade (pipeline/hand_cascade.py, 64 streams x 4 slots) was
measured at 476 fps / ~134 ms per step; this tool splits the gated step
to show where that goes (TODO_NEXT #3: the full-band sampler's M^2
contraction per block is the suspect):

- ``gated``        — full gated step, steady state (all slots tracking)
- ``sample-slots`` — the full-band MXU sampler alone on [B,S,5] slot ROIs
- ``lm-cnn``       — hand-landmark CNN on pre-sampled [B,S,224,224,3]
- ``detect``       — the batched palm-detect branch (letterbox + CNN + NMS)
- ``track-slots``  — sampler + CNN + decode + ROI update (the whole
                     landmark half, _track_slots_batch)

Usage: python examples/handbench.py [batch [slots [arms]]]
(default 64 4; ``arms`` is a comma-separated subset of
gated,sample-slots,lm-cnn,detect,track-slots — e.g. ``gated`` for a
batch-size sweep without compiling the isolation arms)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

# Honor a CPU override even where sitecustomize force-registers a TPU
# platform (JAX_PLATFORMS alone is not enough there — see CLAUDE.md).
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax

SCAN_STEPS = int(os.environ.get("ZARU_TPU_HB_SCAN", "8"))
WINDOWS = int(os.environ.get("ZARU_TPU_HB_WINDOWS", "4"))


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))

    from zaru_tpu.pipeline import MultiHandTracker
    from zaru_tpu.bench_programs import make_1080p_frame

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    frame = make_1080p_frame()
    print(f"device: {jax.devices()[0].device_kind}; batch={batch}x{slots}, "
          f"scan={SCAN_STEPS}, windows={WINDOWS}", file=sys.stderr)

    # presence_threshold=0 keeps synthetic slots alive (the fixture has no
    # real hands); detection then runs only on the interval cadence, so
    # ``gated`` measures the steady state.
    tracker = MultiHandTracker(max_hands=slots, presence_threshold=0.0)
    params = tracker.params
    frame_dev = jax.device_put(jnp.asarray(frame))
    frames = jax.jit(
        lambda f: jnp.broadcast_to(f[None], (batch, *f.shape)) + 0
    )(frame_dev)
    jax.block_until_ready(frames)

    # The fixture photo has no hands, so synthesize plausible slot ROIs
    # (the step cost is shape-dependent, not content-dependent): four
    # rotated hand-sized boxes spread over the frame, all slots active.
    rng = np.random.default_rng(3)
    rois_np = np.stack(
        [
            np.stack(
                [
                    rng.uniform(300, 1600, slots),   # cx
                    rng.uniform(200, 900, slots),    # cy
                    rng.uniform(180, 320, slots),    # w
                    rng.uniform(180, 320, slots),    # h
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
    rois = state["rois"]  # [B, S, 5]

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
        return out["presence"], st

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
    jax.block_until_ready(xs0)

    def lm_cnn_only(frames, xs):
        # Flat [B*S] batch — matches the production path
        # (multi_object._track_slots_batch); the earlier nested-vmap form
        # measured 13.7 ms here and 33.8 ms for FaceMesh (BENCHMARKS
        # "Nested vmap over CNNs").
        b, s_ = xs.shape[:2]
        outs = jax.vmap(
            lambda t: lm_cnn.apply_tensor_hwc(params["lm"], t)
        )(xs.reshape((b * s_,) + xs.shape[2:]))
        s = jnp.sum(outs[0])
        return outs[0], xs + 1e-30 * s

    def detect(frames, prm):
        cand_rois, cand_valid = tracker._detect_batch(prm, frames)
        k = min(prm["det"])
        det2 = dict(prm["det"])
        det2[k] = det2[k] + 1e-30 * jnp.sum(cand_rois)
        return cand_rois, dict(prm, det=det2)

    def track_slots(frames, rrs):
        new_rois, conf, _extras, _pos = tracker._track_slots_batch(
            params, frames, rrs
        )
        return conf, rrs + 1e-30 * jnp.sum(conf)

    paths = {
        "gated": scan_of(gated, state),
        "sample-slots": scan_of(sample_slots, view_rects),
        "lm-cnn": scan_of(lm_cnn_only, xs0),
        "detect": scan_of(detect, params),
        "track-slots": scan_of(track_slots, rois),
    }
    if len(sys.argv) > 3:
        wanted = set(sys.argv[3].split(","))
        unknown = wanted - set(paths)
        if unknown:
            sys.exit(f"unknown arms {sorted(unknown)}; have {sorted(paths)}")
        paths = {k: v for k, v in paths.items() if k in wanted}
    for name, run in paths.items():
        try:
            run()  # compile
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  file=sys.stderr)
            continue
        best = float("inf")
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            run()
            best = min(best, (time.perf_counter() - t0) / SCAN_STEPS)
        print(f"batch {batch:3d}x{slots}  {name:14s} {best*1e3:8.2f} ms/step "
              f"({batch / best:.0f} fps)")


if __name__ == "__main__":
    main()
