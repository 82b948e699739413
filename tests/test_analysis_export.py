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

    def test_state_sidecar_suffixless_path_roundtrips(self, tmp_path):
        """np.savez silently appends '.npz' to suffix-less paths; the
        sidecar API must round-trip for ANY path (writes via a file
        handle)."""
        from zaru_tpu.export import load_state, save_state

        state = {"x": jnp.ones(3, jnp.float32)}
        path = tmp_path / "cascade.state"  # no .npz suffix
        save_state(state, path)
        assert path.exists(), list(tmp_path.iterdir())
        back = load_state(path)
        np.testing.assert_array_equal(back["x"], np.ones(3, np.float32))

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

    def test_state_sidecar_is_pickle_free(self, tmp_path):
        """The sidecar must load under allow_pickle=False — shipping one
        between hosts can never execute code (ADVICE r4 medium)."""
        from zaru_tpu.export import save_state

        state = {"a": jnp.ones((2, 3)), "b": (jnp.zeros(1), None), "c": {}}
        path = tmp_path / "state.npz"
        save_state(state, path)
        with np.load(path, allow_pickle=False) as data:  # must not raise
            assert "__tree__" in data.files
            assert "__treedef__" not in data.files
            for name in data.files:
                assert data[name].dtype != object

    def test_state_sidecar_mixed_containers(self, tmp_path):
        """tuples/lists/None round-trip with exact container types."""
        from zaru_tpu.export import load_state, save_state

        state = {
            "t": (jnp.arange(3), [jnp.zeros(2), None]),
            "empty": {},
            "n": None,
        }
        path = tmp_path / "state.npz"
        save_state(state, path)
        back = load_state(path)
        assert jax.tree_util.tree_structure(back) == jax.tree_util.tree_structure(
            state
        )
        assert isinstance(back["t"], tuple) and isinstance(back["t"][1], list)
        assert back["t"][1][1] is None and back["n"] is None

    def test_legacy_pickle_sidecar_rejected(self, tmp_path):
        """The round-4 pickle-based layout is refused with an actionable
        message, and a sidecar carrying pickled object arrays is refused
        by numpy itself (allow_pickle=False)."""
        import pickle

        from zaru_tpu.export import load_state

        legacy = tmp_path / "legacy.npz"
        np.savez(
            legacy,
            __treedef__=np.frombuffer(pickle.dumps({"x": 1}), np.uint8),
            leaf_0=np.zeros(2),
        )
        with pytest.raises(ValueError, match="legacy pickle-based"):
            load_state(legacy)

        tampered = tmp_path / "tampered.npz"
        np.savez(
            tampered,
            __format__=np.int64(2),
            __tree__=np.str_('{"kind":"leaf","i":0}'),
            leaf_0=np.array({"attack": "payload"}, dtype=object),
        )
        with pytest.raises(ValueError):
            load_state(tampered)

    def test_wrong_format_version_rejected(self, tmp_path):
        from zaru_tpu.export import load_state

        path = tmp_path / "future.npz"
        np.savez(
            path,
            __format__=np.int64(99),
            __tree__=np.str_('{"kind":"leaf","i":0}'),
            leaf_0=np.zeros(1),
        )
        with pytest.raises(ValueError, match="unsupported sidecar format"):
            load_state(path)

    def test_non_sidecar_npz_rejected(self, tmp_path):
        from zaru_tpu.export import load_state

        path = tmp_path / "random.npz"
        np.savez(path, x=np.zeros(3))
        with pytest.raises(ValueError, match="not a zaru_tpu state sidecar"):
            load_state(path)

    def test_manifest_roundtrip(self, tmp_path):
        from zaru_tpu.export import read_manifest, write_manifest

        art = tmp_path / "step.stablehlo"
        art.write_bytes(b"x")
        assert read_manifest(art) is None
        write_manifest(
            art,
            pipeline="face",
            kind="single-stream step",
            batch=0,
            frame_shape=(64, 64, 4),
            frame_dtype="uint8",
            platforms=("cpu", "tpu"),
            state_leaves=7,
        )
        meta = read_manifest(art)
        assert meta["pipeline"] == "face"
        assert meta["frame_shape"] == [64, 64, 4]
        assert meta["platforms"] == ["cpu", "tpu"]
        assert meta["framework"] == "zaru_tpu"
        assert meta["state_leaves"] == 7 and meta["jax_version"]
