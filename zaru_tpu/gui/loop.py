"""GUI event loop: per-key windows driven from the main thread.

Mirrors the reference's architecture (reference crates/zaru/src/gui/mod.rs:
27-126,129-169): the *main* thread owns the window system and runs the
event loop; the user callback runs on a spawned thread and communicates
frames through ``show_image`` messages; closing a window or pressing
ESC/`q` ends the event loop, which terminates the app. Window titles carry
a live FPS readout (the reference logs FPS via FpsCounter, timer.rs:112-175).

Renderers are pluggable (``ZARU_TPU_GUI``):

- ``cv2``  — OpenCV HighGUI windows; all HighGUI calls stay on the loop
  thread (cv2's requirement), frames coalesce to latest-wins per window.
- ``file`` — every frame appended as a PNG under ``ZARU_TPU_GUI_DIR``;
  nothing is dropped (the recording analog).
- ``none`` — frames are counted and discarded.
"""

from __future__ import annotations

import logging
import os
import threading
import time
from collections import deque
from pathlib import Path

log = logging.getLogger(__name__)

__all__ = ["EventLoop", "make_renderer"]

_ESC = 27


class _Renderer:
    #: True → only the newest pending frame per window is rendered.
    coalesce = True

    def render(self, key: str, frame) -> None:
        raise NotImplementedError

    def poll(self) -> bool:
        """Pump window events; returns False to request loop shutdown."""
        time.sleep(0.005)
        return True

    def set_title(self, key: str, title: str) -> None:
        pass

    def close(self) -> None:
        pass


class NullRenderer(_Renderer):
    def __init__(self):
        self.frames = 0

    def render(self, key, frame):
        self.frames += 1


class FileRenderer(_Renderer):
    """PNG-per-frame sink (headless recording)."""

    coalesce = False

    def __init__(self, directory: str | None = None):
        self.dir = Path(
            directory
            or os.environ.get("ZARU_TPU_GUI_DIR", "/tmp/zaru_tpu_gui")
        )
        self._counters: dict[str, int] = {}

    def render(self, key, frame):
        import cv2

        out_dir = self.dir / key
        out_dir.mkdir(parents=True, exist_ok=True)
        n = self._counters.get(key, 0)
        self._counters[key] = n + 1
        cv2.imwrite(
            str(out_dir / f"{n:06d}.png"),
            cv2.cvtColor(frame[..., :3], cv2.COLOR_RGB2BGR),
        )


class Cv2Renderer(_Renderer):
    """Interactive HighGUI windows; must run on one thread (the loop's)."""

    def __init__(self):
        import cv2

        self._cv2 = cv2
        self._windows: set[str] = set()

    def render(self, key, frame):
        cv2 = self._cv2
        if key not in self._windows:
            cv2.namedWindow(key, cv2.WINDOW_AUTOSIZE)
            self._windows.add(key)
        cv2.imshow(key, cv2.cvtColor(frame[..., :3], cv2.COLOR_RGB2BGR))

    def poll(self) -> bool:
        cv2 = self._cv2
        if not self._windows:
            time.sleep(0.005)
            return True
        k = cv2.waitKey(15) & 0xFF
        if k in (_ESC, ord("q")):
            log.info("ESC/q pressed; shutting down")
            return False
        for key in self._windows:
            # A user-closed window reads as not-visible (reference
            # WindowEvent::CloseRequested, gui/mod.rs:64-76).
            if cv2.getWindowProperty(key, cv2.WND_PROP_VISIBLE) < 1:
                log.info("window %r closed; shutting down", key)
                return False
        return True

    def set_title(self, key, title):
        if key in self._windows:
            self._cv2.setWindowTitle(key, title)

    def close(self):
        self._cv2.destroyAllWindows()


def make_renderer(backend: str) -> _Renderer:
    if backend == "cv2":
        return Cv2Renderer()
    if backend == "file":
        return FileRenderer()
    if backend == "none":
        return NullRenderer()
    raise ValueError(f"unknown ZARU_TPU_GUI backend {backend!r}")


class EventLoop:
    """Latest-wins (or fully-queued) frame mailbox + render/poll loop."""

    def __init__(self, renderer: _Renderer):
        self.renderer = renderer
        self._mailbox: dict[str, deque] = {}
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._user_done = threading.Event()
        self._stop = threading.Event()
        self.exit_code: int | None = None
        self.ui_requested_exit = False
        self._fps_count: dict[str, int] = {}
        self._fps_t0 = time.monotonic()

    # --- called from any thread ------------------------------------------

    def post(self, key: str, frame) -> None:
        with self._lock:
            q = self._mailbox.setdefault(
                key, deque(maxlen=1 if self.renderer.coalesce else None)
            )
            q.append(frame)
        self._wake.set()

    def request_stop(self, code: int = 0) -> None:
        """Programmatic shutdown (the reference's event-loop exit path)."""
        self.exit_code = code
        self.ui_requested_exit = True
        self._stop.set()
        self._wake.set()

    def notify_user_done(self) -> None:
        self._user_done.set()
        self._wake.set()

    # --- main thread ---------------------------------------------------------

    def _drain_once(self) -> int:
        with self._lock:
            batch = []
            for key, q in self._mailbox.items():
                if not q:
                    continue
                if self.renderer.coalesce:
                    batch.append((key, [q.popleft()]))
                else:
                    # Recording sinks (FileRenderer) keep every frame:
                    # drain the WHOLE queue per iteration, or a producer
                    # above ~200 fps outruns the 5 ms poll cadence and
                    # the unbounded queue grows for the entire run.
                    frames = list(q)
                    q.clear()
                    batch.append((key, frames))
        n = 0
        for key, frames in batch:
            for frame in frames:
                self.renderer.render(key, frame)
            n += len(frames)
            self._fps_count[key] = self._fps_count.get(key, 0) + len(frames)
        now = time.monotonic()
        if now - self._fps_t0 >= 1.0:
            dt = now - self._fps_t0
            for key, cnt in self._fps_count.items():
                if cnt:
                    self.renderer.set_title(key, f"{key} — {cnt / dt:.0f} FPS")
            self._fps_count = {k: 0 for k in self._fps_count}
            self._fps_t0 = now
        return n

    def _pending(self) -> bool:
        with self._lock:
            return any(self._mailbox.values())

    def run(self) -> None:
        """Runs until the UI requests exit, or the user callback finished
        AND the mailbox is drained. Must be called on the thread that owns
        the window system."""
        try:
            while not self._stop.is_set():
                rendered = self._drain_once()
                if not self.renderer.poll():
                    self.ui_requested_exit = True
                    self.exit_code = 0
                    break
                if self._user_done.is_set() and not self._pending():
                    break
                if not rendered:
                    self._wake.wait(timeout=0.05)
                    self._wake.clear()
            # Final drain so recording sinks keep every frame.
            while self._pending():
                self._drain_once()
        finally:
            self.renderer.close()
