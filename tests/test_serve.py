"""Serving-loop policy tests: join/leave, drop accounting, stats, and the
CLI integration (VERDICT r4 weak #5 — `serve` as a server, not a lockstep
demo). The reference contract being matched is the survive-forever loop of
webcam.rs:291-313."""

import json
import threading
import time

import numpy as np
import pytest

from zaru_tpu.serve import ServeStats, StreamSet, reset_state_slots


def frames_source(n, value, shape=(4, 4, 4)):
    def factory():
        for _ in range(n):
            yield np.full(shape, value, np.uint8)

    factory.name = f"src{value}x{n}"
    return factory


class TestStreamSet:
    def test_leave_then_join_from_pending(self):
        ss = StreamSet(
            [frames_source(2, 1), frames_source(5, 2)],
            pending=[frames_source(3, 7)],
        )
        ss.prime()
        assert ss.n_active == 2
        seen = []
        for _ in range(4):
            frames, events = ss.gather(wait=1.0)
            seen.append((frames[0][0, 0, 0], [e.kind for e in events]))
        # Source 1 (two frames) ends; src 7 joins into slot 0.
        kinds = [k for _, ks in seen for k in ks]
        assert kinds == ["leave", "join"]
        values = [v for v, _ in seen]
        assert 7 in values and values[0] == 1
        assert ss.joins == 1 and ss.leaves == 1

    def test_exhausted_slot_goes_inactive(self):
        ss = StreamSet([frames_source(1, 3), frames_source(7, 5)])
        ss.prime()
        for _ in range(4):
            ss.gather(wait=1.0)
        assert ss.active == [False, True]
        assert ss.leaves == 1 and ss.joins == 0
        # The freed slot keeps serving a (zeroed) frame of the right shape.
        frames, _ = ss.gather(wait=1.0)
        assert frames[0].shape == (4, 4, 4)

    def test_corrupt_decode_counts_drop_and_survives(self):
        """A decode exception mid-stream re-serves the previous frame
        and counts a drop — the survive-a-flaky-camera contract
        (webcam.rs:291-313) covers FAILED decodes, not just slow ones.
        A source whose iterator RECOVERS keeps serving; a generator
        that dies on the exception leaves cleanly (no crash either way)."""

        class FlakyIter:
            # One good frame, one OSError, then good frames again —
            # a camera driver hiccup, not a dead source.
            def __init__(self):
                self.n = 0

            def __iter__(self):
                return self

            def __next__(self):
                self.n += 1
                if self.n == 2:
                    raise OSError("truncated jpeg")
                if self.n > 5:
                    raise StopIteration
                return np.full((4, 4, 4), 1 if self.n == 1 else 3, np.uint8)

        def flaky_factory():
            return FlakyIter()

        flaky_factory.name = "flaky"
        ss = StreamSet([flaky_factory, frames_source(9, 2)])
        ss.prime()
        values = []
        for _ in range(4):
            frames, events = ss.gather(wait=1.0)
            values.append(int(frames[0][0, 0, 0]))
            assert frames[1][0, 0, 0] == 2  # healthy stream unaffected
        # First gather hits the OSError: previous frame (1) re-served,
        # drop counted; later gathers serve the recovered frames (3).
        assert values[0] == 1 and 3 in values
        assert ss.drops[0] >= 1 and ss.drops[1] == 0
        ss.close()

    def test_dead_generator_source_leaves_cleanly(self):
        """A generator source that raises mid-stream cannot resume
        (Python closes it): the slot takes one drop, then leaves —
        never propagating the exception into the serve loop."""

        def dying_factory():
            yield np.full((4, 4, 4), 1, np.uint8)
            raise OSError("device unplugged")

        dying_factory.name = "dying"
        ss = StreamSet([dying_factory, frames_source(9, 2)])
        ss.prime()
        kinds = []
        for _ in range(4):
            frames, events = ss.gather(wait=1.0)
            kinds += [e.kind for e in events]
            assert frames[1][0, 0, 0] == 2
        assert ss.drops[0] >= 1
        assert "leave" in kinds and ss.active == [False, True]
        ss.close()

    def test_midrun_join_rejects_wrong_resolution(self):
        """A pending source with a different resolution must NOT crash
        the loop when it tries to join mid-run; it is rejected and the
        next pending source joins instead."""
        ss = StreamSet(
            [frames_source(1, 1), frames_source(6, 2)],
            pending=[
                frames_source(3, 7, shape=(8, 8, 4)),  # wrong resolution
                frames_source(3, 9),                   # correct
            ],
        )
        ss.prime()
        kinds = []
        for _ in range(4):
            frames, events = ss.gather(wait=1.0)
            kinds += [(e.kind, e.source) for e in events]
            assert all(f.shape == (4, 4, 4) for f in frames)
        assert ("reject", "src7x3") in kinds
        assert ("join", "src9x3") in kinds
        ss.close()

    def test_stats_fresh_frames_exclude_drops(self):
        """record_step(n_active, n_dropped) counts only fresh frames."""
        ss = StreamSet([frames_source(4, 1), frames_source(4, 2)])
        ss.prime()
        st = ServeStats(streams=2)
        st.record_step(0.01, 2, n_dropped=0)
        st.record_step(0.01, 2, n_dropped=1)
        assert st.frames == 3
        assert "3 fresh frames" in st.summary(ss)
        ss.close()

    def test_slow_decode_counts_drop_and_recovers(self):
        release = threading.Event()

        def slow_factory():
            yield np.full((4, 4, 4), 9, np.uint8)
            release.wait(5.0)
            yield np.full((4, 4, 4), 10, np.uint8)

        slow_factory.name = "slow"
        ss = StreamSet([slow_factory])
        ss.prime()
        frames, _ = ss.gather(wait=0.05)  # decode blocked -> drop
        assert ss.drops == [1]
        assert frames[0][0, 0, 0] == 9  # previous frame re-served
        release.set()
        time.sleep(0.2)
        frames, _ = ss.gather(wait=1.0)
        assert frames[0][0, 0, 0] == 10  # late decode lands next step
        assert ss.drops == [1]
        ss.close()

    def test_prime_rejects_mixed_resolutions(self):
        ss = StreamSet(
            [frames_source(2, 1), frames_source(2, 2, shape=(8, 8, 4))]
        )
        with pytest.raises(RuntimeError, match="one resolution"):
            ss.prime()

    def test_empty_slot_primed_from_pending(self):
        ss = StreamSet([frames_source(2, 1), None], pending=[frames_source(2, 4)])
        events = ss.prime()
        assert [e.kind for e in events] == ["join"]
        assert ss.n_active == 2


class TestResetStateSlots:
    def test_resets_only_given_slots(self):
        state = {
            "roi": np.arange(12, dtype=np.float32).reshape(3, 4),
            "nested": {"t": np.array([True, True, True])},
        }
        fresh = {
            "roi": np.zeros((3, 4), np.float32),
            "nested": {"t": np.array([False, False, False])},
        }
        out = reset_state_slots(state, fresh, [1])
        np.testing.assert_array_equal(out["roi"][0], state["roi"][0])
        np.testing.assert_array_equal(out["roi"][1], 0)
        np.testing.assert_array_equal(out["roi"][2], state["roi"][2])
        assert list(out["nested"]["t"]) == [True, False, True]
        # No-op for an empty slot list; input untouched either way.
        assert reset_state_slots(state, fresh, []) is state
        assert state["nested"]["t"][1]

    def test_tracker_state_reset_makes_slot_redetect(self):
        """Resetting a live FaceTracker state slot clears tracking so the
        next step's gate runs detection for the joined stream."""
        from zaru_tpu.pipeline import FaceTracker

        tracker = FaceTracker()
        fresh = tracker.init_state(batch=2)
        live = {
            "roi": np.ones((2, 5), np.float32),
            "tracking": np.array([True, True]),
            "filter": {
                k: np.asarray(v)
                for k, v in fresh["filter"].items()
            },
        }
        out = reset_state_slots(live, fresh, [0])
        assert not bool(out["tracking"][0]) and bool(out["tracking"][1])


class TestServeStats:
    def test_report_and_summary(self):
        ss = StreamSet([frames_source(3, 1)])
        ss.prime()
        stats = ServeStats(streams=1)
        for _ in range(3):
            stats.record_step(0.01, 1)
        line = stats.report_line(ss)
        assert "frames/s e2e" in line and "drops 0" in line
        assert "active 1/1" in line
        summary = stats.summary(ss)
        assert "p50" in summary and "p95" in summary
        assert "joins 0" in summary and "leaves 1" not in summary
        ss.close()


@pytest.fixture
def no_persistent_cache():
    """Disables the persistent compile cache for serve-CLI tests.

    The gated-cascade program these tests compile at the fixture shape
    reproducibly ABORTS XLA:CPU when a run re-reads its own persisted
    executable (three full-suite crashes at this exact cache read,
    2026-08-21; the fresh-compile path is always fine). Until that
    serialization bug is root-caused, these tests trade ~1 min of
    recompilation for not poisoning/reading those entries.
    """
    import jax

    jax.config.update("jax_enable_compilation_cache", False)
    try:
        yield
    finally:
        jax.config.update("jax_enable_compilation_cache", True)


@pytest.mark.usefixtures("no_persistent_cache")
class TestServeCLI:
    def test_no_loop_join_leave(self, tmp_path, capsys):
        """Two slots, three finite sources: when the short source ends,
        the pending one joins its slot and the loop reports it."""
        import shutil

        from zaru_tpu.__main__ import main
        from zaru_tpu.assets import fixture_path

        src = fixture_path("sad_linus_cropped.jpg")
        dirs = []
        for name, count in (("a", 1), ("b", 4), ("c", 2)):
            d = tmp_path / name
            d.mkdir()
            for i in range(count):
                shutil.copy(src, d / f"{i}.jpg")
            dirs.append(str(d))

        out = tmp_path / "serve.jsonl"
        rc = main(
            [
                "serve",
                *dirs,
                "--streams",
                "2",
                "--steps",
                "8",
                "--no-loop",
                "--out",
                str(out),
                "--report-every",
                "2",
            ]
        )
        assert rc == 0
        err = capsys.readouterr().err
        assert "slot 0: leave" in err and "slot 0: join" in err
        assert "drops" in err and "active" in err  # periodic stats line
        assert "joins 1" in err and "leaves" in err  # summary
        recs = [json.loads(line) for line in out.read_text().splitlines()]
        # Slot 0: source a (1 frame) -> c joins (2 frames) -> inactive;
        # slot 1: source b (4 frames). All sources exhaust -> loop ends
        # early ("all sources exhausted") before 8 steps.
        assert len(recs) < 8
        assert any(r.get("active") == [True, True] for r in recs)
        assert recs[-1]["active"] == [False, True] or recs[-1]["active"] == [
            False,
            False,
        ]

    def test_single_stream_fast_path_schema_and_parity(self, tmp_path):
        """--streams 1 takes the un-vmapped tracker.step program
        (BENCHMARKS "frontier": 24% faster at batch 1) but must keep the
        record schema of the batch program and agree with it on the
        fixture."""
        import os
        import subprocess
        import sys

        from zaru_tpu.__main__ import main
        from zaru_tpu.assets import fixture_path

        src = str(fixture_path("sad_linus_cropped.jpg"))
        outs = {}
        for label, extra in (("single", []), ("batch", ["--batch-program"])):
            out = tmp_path / f"{label}.jsonl"
            args = ["serve", src, "--streams", "1", "--steps", "3",
                    "--out", str(out), *extra]
            if label == "batch":
                # Fresh-process isolation for the gated batch-1 program:
                # compiling/serializing THIS executable late in a long
                # pytest process has aborted three full-suite runs in
                # XLA:CPU's persistence path (CLAUDE.md gotcha) while a
                # fresh process has never failed it. The CLI honors
                # JAX_PLATFORMS=cpu via the config API.
                env = dict(os.environ, JAX_PLATFORMS="cpu")
                proc = subprocess.run(
                    [sys.executable, "-m", "zaru_tpu", *args],
                    env=env, capture_output=True, text=True, timeout=900,
                )
                assert proc.returncode == 0, proc.stderr[-2000:]
            else:
                assert main(args) == 0
            outs[label] = [
                json.loads(line) for line in out.read_text().splitlines()
            ]
        for recs in outs.values():
            assert [r["step"] for r in recs] == [0, 1, 2]
            assert all(r["valid"] == [True] for r in recs)
            assert all(len(r["confidence"]) == 1 for r in recs)
        # Same fixture, same models: both programs track with high
        # confidence. (Bitwise equality is not the contract — the batch
        # program's detection gate is batch-level while the single
        # program detects on loss — but steady-state confidence must
        # agree closely.)
        for a, b in zip(outs["single"], outs["batch"]):
            assert abs(a["confidence"][0] - b["confidence"][0]) < 0.05

    def test_single_stream_join_resets_state(self, tmp_path, capsys):
        """no-loop single-stream: when the source ends and a pending one
        joins slot 0, the fresh stream must re-detect (state reset)."""
        import shutil

        from zaru_tpu.__main__ import main
        from zaru_tpu.assets import fixture_path

        src = fixture_path("sad_linus_cropped.jpg")
        dirs = []
        for name, count in (("a", 2), ("b", 2)):
            d = tmp_path / name
            d.mkdir()
            for i in range(count):
                shutil.copy(src, d / f"{i}.jpg")
            dirs.append(str(d))
        out = tmp_path / "serve.jsonl"
        rc = main(
            ["serve", *dirs, "--streams", "1", "--steps", "8", "--no-loop",
             "--out", str(out)]
        )
        assert rc == 0
        err = capsys.readouterr().err
        assert "slot 0: leave" in err and "slot 0: join" in err
        recs = [json.loads(line) for line in out.read_text().splitlines()]
        # Both sources' frames track the same fixture face.
        assert any(r["valid"] == [True] for r in recs)
        assert recs[-1]["valid"] == [True] or recs[-1].get("active") == [False]

    def test_soak_mode_runs_for_duration(self, tmp_path, capsys):
        from zaru_tpu.__main__ import main
        from zaru_tpu.assets import fixture_path

        out = tmp_path / "soak.jsonl"
        t0 = time.perf_counter()
        rc = main(
            [
                "serve",
                str(fixture_path("sad_linus_cropped.jpg")),
                "--streams",
                "2",
                "--soak",
                "3",
                "--out",
                str(out),
            ]
        )
        assert rc == 0
        assert time.perf_counter() - t0 >= 3.0
        recs = [json.loads(line) for line in out.read_text().splitlines()]
        assert len(recs) >= 1
        assert "served" in capsys.readouterr().err
