"""Micro-benchmark: the detection (full-branch) stage costs.

The gated cascade's steady state is ~21 ms/step at batch 128, but frames
where ANY stream redetects cost ~75 ms (gatebench gated-worst), making
the production cadence (detect every 9 frames) average ~26 ms. This tool
splits the detect branch to find where those ~54 extra ms go:

- ``letterbox-exact`` — per-stream exact full-frame letterbox sample to
  the detector input (the suspected pointwise-gather cost)
- ``letterbox-fast``  — the same crop via the MXU sampler
- ``letterbox-takes`` — the same crop via the exact separable two-take
  sampler (the production detect path; bit-identical to letterbox-exact)
- ``det-cnn``         — BlazeFace on pre-sampled inputs
- ``detect-roi``      — the whole _detect_roi (sample+cnn+decode+nms)
- ``track-batch``     — the landmark half, for reference

Usage: python examples/detbench.py [batch]   (default 128)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

SCAN_STEPS = int(os.environ.get("ZARU_TPU_DB_SCAN", "16"))
WINDOWS = int(os.environ.get("ZARU_TPU_DB_WINDOWS", "4"))

# Env var alone is not honored under the axon sitecustomize — the config
# API call is required for a real CPU run (CLAUDE.md).
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))

    from zaru_tpu.pipeline import FaceTracker
    from zaru_tpu.pipeline import _ops
    from zaru_tpu.ops.sampling import view_to_tensor_core
    from zaru_tpu.bench_programs import make_1080p_frame

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    frame = make_1080p_frame()
    print(f"device: {jax.devices()[0].device_kind}; batch={batch}, "
          f"scan={SCAN_STEPS}, windows={WINDOWS}", file=sys.stderr)

    tracker = FaceTracker()
    det_cnn = tracker.det_cnn
    res = det_cnn.input_resolution()
    frame_dev = jax.device_put(jnp.asarray(frame))
    frames = jax.jit(
        lambda f: jnp.broadcast_to(f[None], (batch, *f.shape)) + 0
    )(frame_dev)
    jax.block_until_ready(frames)
    state, out = tracker.run_frames(tracker.init_state(batch=batch), frames)
    assert bool(np.asarray(out["valid"]).all())
    rois = out["roi"]

    def fit_rrect(f):
        return _ops.full_frame_fit(f, res)[1]

    # Each path threads a CHEAP carry perturbed by the output (1e-30 * sum:
    # numerically zero, but XLA cannot prove it) — otherwise the loop body
    # is loop-invariant and LICM hoists it, measuring one execution plus
    # the ~32 ms tunnel readback amortized over the scan.
    def scan_of(fn, carry0):
        @jax.jit
        def run(frames, carry0):
            def body(carry, _):
                out, carry = fn(frames, carry)
                return carry, jnp.sum(out)

            _c, sums = lax.scan(body, carry0, jnp.arange(SCAN_STEPS))
            return jnp.sum(sums)

        return lambda: float(run(frames, carry0))

    w, h = res.width, res.height
    rrs0 = jax.jit(jax.vmap(fit_rrect))(frames)
    jax.block_until_ready(rrs0)

    def letterbox_exact(frames, rrs):
        xs = jax.vmap(
            lambda f, rr: view_to_tensor_core(f, rr, w, h, -1.0, 1.0, "NHWC")
        )(frames, rrs)
        s = jnp.sum(xs)
        return xs, rrs + 1e-30 * s

    def letterbox_fast(frames, rrs):
        xs = det_cnn.sample_views_fast(frames, rrs)
        s = jnp.sum(xs)
        return xs, rrs + 1e-30 * s

    def letterbox_takes(frames, rrs):
        # The production detect path: exact separable two-take sampler
        # (bit-identical to letterbox-exact; angle 0 only).
        xs = det_cnn.sample_views_letterbox(frames, rrs)
        s = jnp.sum(xs)
        return xs, rrs + 1e-30 * s

    xs_det = jax.jit(lambda f: letterbox_fast(f, rrs0)[0])(frames)
    jax.block_until_ready(xs_det)

    def det_cnn_only(frames, xs):
        outs = jax.vmap(
            lambda t: det_cnn.apply_tensor_hwc(tracker.params["det"], t)
        )(xs)
        s = jnp.sum(outs[0])
        return outs[0], xs + 1e-30 * s

    def detect_roi(frames, params):
        rois, found = jax.vmap(
            lambda f: tracker._detect_roi(params, f)
        )(frames)
        # Perturb one small weight tensor to defeat hoisting.
        k = min(params["det"])
        det2 = dict(params["det"])
        det2[k] = det2[k] + 1e-30 * jnp.sum(rois)
        return rois, dict(params, det=det2)

    def track_batch(frames, st_rois):
        seeded = jnp.zeros((frames.shape[0],), bool)
        _st, out = tracker._track_batch(
            tracker.params, state, frames, st_rois, seeded
        )
        return out["confidence"], st_rois + 1e-30 * jnp.sum(out["confidence"])

    paths = {
        "letterbox-exact": scan_of(letterbox_exact, rrs0),
        "letterbox-fast": scan_of(letterbox_fast, rrs0),
        "letterbox-takes": scan_of(letterbox_takes, rrs0),
        "det-cnn": scan_of(det_cnn_only, xs_det),
        "detect-roi": scan_of(detect_roi, tracker.params),
        "track-batch": scan_of(track_batch, rois),
    }
    for name, run in paths.items():
        try:
            run()  # compile
        except Exception as e:
            print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  file=sys.stderr)
            continue
        best = float("inf")
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            run()
            best = min(best, (time.perf_counter() - t0) / SCAN_STEPS)
        print(f"batch {batch:4d}  {name:16s} {best*1e3:8.2f} ms/step")


if __name__ == "__main__":
    main()
