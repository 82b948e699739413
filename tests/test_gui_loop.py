"""Headless tests for the GUI event loop (gui/loop.py, gui.run).

Drives the same loop machinery the interactive cv2 backend uses, via the
file/none renderers (reference architecture: gui/mod.rs:27-126 — event
loop on the main thread, user callback on a worker thread, window
close/ESC mapped to app shutdown)."""

import threading
import time

import numpy as np
import pytest

from zaru_tpu import gui
from zaru_tpu.gui.loop import EventLoop, FileRenderer, NullRenderer


def _frame(v=0):
    return np.full((8, 8, 4), v, np.uint8)


class TestEventLoop:
    def test_file_renderer_keeps_every_frame(self, tmp_path):
        loop = EventLoop(FileRenderer(str(tmp_path)))

        def app():
            for i in range(5):
                loop.post("win", _frame(i))
            loop.notify_user_done()

        t = threading.Thread(target=app)
        t.start()
        loop.run()
        t.join()
        files = sorted((tmp_path / "win").glob("*.png"))
        assert len(files) == 5  # recording sink: nothing dropped

    def test_null_renderer_coalesces(self):
        r = NullRenderer()
        loop = EventLoop(r)
        for i in range(100):
            loop.post("win", _frame(i))
        loop.notify_user_done()
        loop.run()
        assert 1 <= r.frames < 100  # latest-wins mailbox

    def test_request_stop_ends_loop(self):
        loop = EventLoop(NullRenderer())

        def app():
            loop.post("win", _frame())
            time.sleep(0.05)
            loop.request_stop(3)
            # Keep "running" — the loop must not wait for user completion.
            time.sleep(10)

        t = threading.Thread(target=app, daemon=True)
        t.start()
        t0 = time.monotonic()
        loop.run()
        assert time.monotonic() - t0 < 5
        assert loop.ui_requested_exit
        assert loop.exit_code == 3

    def test_multiple_windows(self, tmp_path):
        loop = EventLoop(FileRenderer(str(tmp_path)))
        for key in ("a", "b"):
            loop.post(key, _frame())
        loop.notify_user_done()
        loop.run()
        assert (tmp_path / "a" / "000000.png").is_file()
        assert (tmp_path / "b" / "000000.png").is_file()


class TestRunHarness:
    def test_run_renders_and_exits_cleanly(self, tmp_path, monkeypatch):
        monkeypatch.setenv("ZARU_TPU_GUI", "file")
        monkeypatch.setenv("ZARU_TPU_GUI_DIR", str(tmp_path))

        def app():
            for i in range(3):
                gui.show_image("w", _frame(i))

        gui.run(app)  # returns without SystemExit on success
        assert len(list((tmp_path / "w").glob("*.png"))) == 3

    def test_run_maps_error_to_exit_code(self, monkeypatch):
        monkeypatch.setenv("ZARU_TPU_GUI", "none")

        def app():
            raise RuntimeError("boom")

        with pytest.raises(SystemExit) as e:
            gui.run(app)
        assert e.value.code == 1

    def test_run_nonzero_return_becomes_exit_code(self, monkeypatch):
        monkeypatch.setenv("ZARU_TPU_GUI", "none")
        with pytest.raises(SystemExit) as e:
            gui.run(lambda: 7)
        assert e.value.code == 7

    def test_main_decorator_runs_on_call_not_decoration(self, monkeypatch):
        """@gui.main must NOT execute at decoration time (helpers defined
        below the decorated function would not exist yet); calling the
        wrapper runs the app under the loop."""
        monkeypatch.setenv("ZARU_TPU_GUI", "none")
        ran = []

        @gui.main
        def app():
            ran.append(helper())

        def helper():  # defined AFTER the decorated function, like real apps
            return 42

        assert ran == []  # decoration did not run it
        app()
        assert ran == [42]

    def test_init_logger_accepts_lowercase_env(self, monkeypatch):
        import logging

        monkeypatch.setenv("ZARU_TPU_LOG", "debug")
        gui.init_logger()  # must not raise ValueError('Unknown level')
        assert logging.getLogger("zaru_tpu").level == logging.DEBUG

    def test_file_renderer_drains_fast_producer(self, tmp_path, monkeypatch):
        """A producer faster than the 5 ms poll cadence must still get
        every frame recorded promptly (whole-queue drain per iteration)."""
        monkeypatch.setenv("ZARU_TPU_GUI", "file")
        monkeypatch.setenv("ZARU_TPU_GUI_DIR", str(tmp_path))
        n = 300

        def app():
            for i in range(n):
                gui.show_image("w", _frame(i))

        t0 = time.monotonic()
        gui.run(app)
        assert len(list((tmp_path / "w").glob("*.png"))) == n
        # One-frame-per-5ms drain would need >=1.5 s just to drain.
        assert time.monotonic() - t0 < 10

    def test_request_stop_from_app(self, monkeypatch):
        monkeypatch.setenv("ZARU_TPU_GUI", "none")

        def app():
            gui.show_image("w", _frame())
            gui.request_stop(0)
            time.sleep(10)  # loop must not wait for us

        t0 = time.monotonic()
        with pytest.raises(SystemExit) as e:
            gui.run(app)
        assert time.monotonic() - t0 < 5
        assert e.value.code == 0
