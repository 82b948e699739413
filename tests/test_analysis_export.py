"""Cost analysis + AOT export tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zaru_tpu.assets import model_path
from zaru_tpu.onnx import load_model
from zaru_tpu.onnx.analysis import analyze


class TestAnalysis:
    def test_blazeface_costs(self):
        m = load_model(model_path("face_detection_short_range.onnx"))
        rep = analyze(m)
        # BlazeFace short-range: ~0.1 GFLOP, ~0.4 MB of weights.
        assert 0.02e9 < rep.flops < 1e9, rep.flops
        assert 0.05e6 < rep.params < 1e6, rep.params
        assert rep.output_shapes == [(1, 896, 16), (1, 896, 1)]
        assert rep.speed_of_light_us() > 0
        assert "GFLOP" in str(rep)


class TestExport:
    def test_model_roundtrip(self, tmp_path):
        from zaru_tpu.export import export_fn, load_exported

        m = load_model(model_path("slim_160_latest.onnx"))
        x = jnp.zeros((1, 3, 160, 160), jnp.float32)
        path = tmp_path / "slim.stablehlo"
        export_fn(lambda inp: m.apply(m.params, inp)[0], (x,), path)
        assert path.stat().st_size > 100_000  # weights baked in

        rng = np.random.default_rng(0)
        xr = jnp.asarray(rng.uniform(-1, 1, (1, 3, 160, 160)).astype(np.float32))
        restored = load_exported(path)
        np.testing.assert_allclose(
            np.asarray(restored(xr)),
            np.asarray(m.apply(m.params, xr)[0]),
            rtol=1e-5,
            atol=1e-5,
        )

    def test_cascade_step_exports(self, tmp_path, sad_linus_full):
        """The fused cascade step itself exports and reloads."""
        from zaru_tpu.export import export_fn, load_exported
        from zaru_tpu.pipeline import FaceTracker

        tracker = FaceTracker(smooth=None)
        state = tracker.init_state()
        frame = sad_linus_full.data
        path = tmp_path / "cascade.stablehlo"
        export_fn(
            lambda st, f: tracker.step(tracker.params, st, f), (state, frame), path
        )
        restored = load_exported(path)
        new_state, out = restored(state, frame)
        assert bool(out["valid"])
        ref_state, ref_out = tracker.run_frame(state, frame)
        np.testing.assert_allclose(
            np.asarray(out["landmarks"]), np.asarray(ref_out["landmarks"]), atol=1e-3
        )

    def test_state_sidecar_roundtrip(self, tmp_path):
        """save_state/load_state preserve the exact pytree structure —
        including EMPTY subtrees (a smoother-less filter state), which an
        exported step's treedef check requires."""
        from zaru_tpu.export import load_state, save_state

        state = {
            "roi": jnp.arange(5, dtype=jnp.float32),
            "tracking": jnp.asarray(False),
            "filter": {},
        }
        path = tmp_path / "state.npz"
        save_state(state, path)
        back = load_state(path)
        assert jax.tree_util.tree_structure(back) == jax.tree_util.tree_structure(
            state
        )
        np.testing.assert_array_equal(back["roi"], np.arange(5, dtype=np.float32))
        assert back["tracking"].item() is False and back["filter"] == {}

    def test_state_sidecar_nested(self, tmp_path):
        """A filter-bearing nested state round-trips value-exactly."""
        from zaru_tpu.export import load_state, save_state
        from zaru_tpu.pipeline import FaceTracker

        tracker = FaceTracker()
        state = tracker.init_state(batch=2)
        path = tmp_path / "state.npz"
        save_state(state, path)
        back = load_state(path)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            state,
            back,
        )
