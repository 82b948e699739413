"""Debug GUI: per-key image windows + app harness.

TPU-native counterpart of reference crates/zaru/src/gui/ (winit/wgpu window
per key, ``gui::show_image``) and the ``#[zaru::main]`` / ``zaru::run``
harness (lib.rs:69-131, zaru-macros).

Architecture mirrors the reference (gui/mod.rs:129-169): :func:`run` keeps
the *main* thread as the window/event-loop owner and runs the user
callback on a spawned thread; :func:`show_image` posts frames to the loop,
which creates one window per key, overlays a live FPS readout in the
title, and maps window-close / ESC to app shutdown. Without :func:`run`
(plain library use), ``show_image`` falls back to direct rendering.

Backends, selected via ``ZARU_TPU_GUI``:

- ``cv2``  — OpenCV HighGUI windows (default when $DISPLAY is set)
- ``file`` — frames written as PNGs under ``ZARU_TPU_GUI_DIR``
  (default ``/tmp/zaru_tpu_gui``); the headless default
- ``none`` — drop frames
"""

from __future__ import annotations

import logging
import os
import sys
import threading

from .loop import EventLoop, make_renderer

log = logging.getLogger(__name__)

__all__ = ["show_image", "request_stop", "run", "main", "init_logger"]

_active_loop: EventLoop | None = None
_fallback_renderers: dict[tuple, object] = {}
_fallback_dismissed: set[tuple] = set()


def _backend() -> str:
    env = os.environ.get("ZARU_TPU_GUI")
    if env:
        return env
    return "cv2" if os.environ.get("DISPLAY") else "file"


def show_image(key: str, image) -> None:
    """Displays ``image`` in the window named ``key``
    (reference gui/mod.rs:172-182). Inside :func:`run`, posts to the event
    loop; standalone, renders directly. Once the user dismisses the
    standalone window (close button / ESC), further frames are dropped —
    the window must not keep reopening (gui/mod.rs:64-76 ends the app on
    close; a standalone library call can't exit the host script, so
    dropping is the analog)."""
    arr = image.to_numpy() if hasattr(image, "to_numpy") else image
    loop = _active_loop
    if loop is not None:
        loop.post(key, arr)
        return
    backend = _backend()
    if backend == "cv2" and threading.current_thread() is not threading.main_thread():
        # After the event loop exits (window closed / ESC), a still-running
        # app thread must not touch HighGUI (main-thread-only); drop the
        # frame — the process is shutting down.
        return
    cache_key = (backend, os.environ.get("ZARU_TPU_GUI_DIR"))
    if cache_key in _fallback_dismissed:
        return
    renderer = _fallback_renderers.get(cache_key)
    if renderer is None:
        renderer = _fallback_renderers[cache_key] = make_renderer(backend)
    renderer.render(key, arr)
    if backend == "cv2" and not renderer.poll():
        _fallback_dismissed.add(cache_key)
        renderer.close()
        _fallback_renderers.pop(cache_key, None)


def request_stop(code: int = 0) -> None:
    """Asks the running event loop to shut the app down (the programmatic
    analog of closing the window)."""
    loop = _active_loop
    if loop is not None:
        loop.request_stop(code)


def init_logger(level=logging.DEBUG) -> None:
    """Default logging setup (reference lib.rs:69-91): debug for the app and
    zaru_tpu, warn elsewhere; ``ZARU_TPU_LOG`` overrides the root level."""
    env_level = os.environ.get("ZARU_TPU_LOG")
    if env_level:
        # RUST_LOG-style values are conventionally lowercase ("debug");
        # logging level names are uppercase — accept either (and ints).
        level = int(env_level) if env_level.isdigit() else env_level.upper()
    logging.basicConfig(
        level=logging.WARNING,
        format="%(asctime)s %(levelname).1s %(name)s: %(message)s",
        stream=sys.stderr,
    )
    logging.getLogger("zaru_tpu").setLevel(level)
    logging.getLogger("__main__").setLevel(level)


def run(callback) -> None:
    """Runs an app callback under the GUI event loop with logging + clean
    exit-code mapping (reference lib.rs:125-131, gui/mod.rs:129-169,
    termination.rs:15-37).

    The callback runs on a worker thread; this (main) thread runs the
    window event loop until the callback finishes (and all frames are
    rendered) or the user closes a window / presses ESC.
    """
    global _active_loop
    init_logger()
    loop = EventLoop(make_renderer(_backend()))
    _active_loop = loop
    outcome: dict = {}

    def worker():
        try:
            outcome["result"] = callback()
        except KeyboardInterrupt:
            outcome["code"] = 130
        except SystemExit as e:
            outcome["code"] = e.code if isinstance(e.code, int) else 0
        except Exception:
            log.exception("app callback failed")
            outcome["code"] = 1
        finally:
            loop.notify_user_done()

    thread = threading.Thread(target=worker, name="zaru-app", daemon=True)
    thread.start()
    try:
        loop.run()
    except KeyboardInterrupt:
        _active_loop = None
        sys.exit(130)
    _active_loop = None

    if loop.ui_requested_exit:
        # Window closed / ESC: terminate like the reference's event-loop
        # exit (gui/mod.rs:64-76); the app thread is a daemon and dies with
        # the process.
        sys.exit(loop.exit_code or 0)
    thread.join(timeout=5)
    if "code" in outcome:
        sys.exit(outcome["code"])
    result = outcome.get("result")
    if isinstance(result, int) and result != 0:
        sys.exit(result)


def main(fn):
    """Decorator equivalent of ``#[zaru::main]``
    (zaru-macros/src/lib.rs:10-50): calling the decorated function runs
    it under the GUI event loop. The Rust macro's wrapped ``main`` runs
    after the whole module has loaded; the Python analog is the standard
    idiom::

        @gui.main
        def main(): ...

        if __name__ == "__main__":
            main()

    (Running at decoration time — an earlier behavior — would execute
    the app before helpers defined below it exist.)
    """

    def wrapper():
        run(fn)

    wrapper.__name__ = getattr(fn, "__name__", "main")
    wrapper.__doc__ = fn.__doc__
    return wrapper
