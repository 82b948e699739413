"""Debug GUI: per-key image windows + app harness.

TPU-native counterpart of reference crates/zaru/src/gui/ (winit/wgpu window
per key, `gui::show_image`) and the `#[zaru::main]` / `zaru::run` harness
(lib.rs:69-131, zaru-macros). Backends, selected via ``ZARU_TPU_GUI``:

- ``cv2``  — OpenCV HighGUI windows (default when $DISPLAY is set)
- ``file`` — frames written as PNGs under ``ZARU_TPU_GUI_DIR``
  (default ``/tmp/zaru_tpu_gui``); the headless default
- ``none`` — drop frames
"""

from __future__ import annotations

import logging
import os
import sys
from pathlib import Path

log = logging.getLogger(__name__)

__all__ = ["show_image", "run", "main", "init_logger"]

_frame_counters: dict[str, int] = {}


def _backend() -> str:
    env = os.environ.get("ZARU_TPU_GUI")
    if env:
        return env
    return "cv2" if os.environ.get("DISPLAY") else "file"


def show_image(key: str, image) -> None:
    """Displays an image in the window named ``key``
    (reference gui/mod.rs:172-182)."""
    backend = _backend()
    if backend == "none":
        return
    arr = image.to_numpy() if hasattr(image, "to_numpy") else image
    if backend == "cv2":
        import cv2

        bgr = cv2.cvtColor(arr[..., :3], cv2.COLOR_RGB2BGR)
        cv2.imshow(key, bgr)
        cv2.waitKey(1)
        return
    if backend == "file":
        import cv2

        out_dir = Path(os.environ.get("ZARU_TPU_GUI_DIR", "/tmp/zaru_tpu_gui")) / key
        out_dir.mkdir(parents=True, exist_ok=True)
        n = _frame_counters.get(key, 0)
        _frame_counters[key] = n + 1
        cv2.imwrite(
            str(out_dir / f"{n:06d}.png"),
            cv2.cvtColor(arr[..., :3], cv2.COLOR_RGB2BGR),
        )
        return
    raise ValueError(f"unknown ZARU_TPU_GUI backend {backend!r}")


def init_logger(level=logging.DEBUG) -> None:
    """Default logging setup (reference lib.rs:69-91): debug for the app and
    zaru_tpu, warn elsewhere; ``ZARU_TPU_LOG`` overrides the root level."""
    env_level = os.environ.get("ZARU_TPU_LOG")
    logging.basicConfig(
        level=logging.WARNING,
        format="%(asctime)s %(levelname).1s %(name)s: %(message)s",
        stream=sys.stderr,
    )
    logging.getLogger("zaru_tpu").setLevel(env_level or level)
    logging.getLogger("__main__").setLevel(env_level or level)


def run(callback) -> None:
    """Runs an app callback with logging + clean exit-code mapping
    (reference lib.rs:125-131, termination.rs:15-37)."""
    init_logger()
    try:
        result = callback()
    except KeyboardInterrupt:
        sys.exit(130)
    except Exception:
        log.exception("app callback failed")
        sys.exit(1)
    finally:
        if _backend() == "cv2":
            try:
                import cv2

                cv2.destroyAllWindows()
            except Exception:
                pass
    if isinstance(result, int):
        sys.exit(result)


def main(fn):
    """Decorator equivalent of ``#[zaru::main]``
    (zaru-macros/src/lib.rs:10-50)."""

    def wrapper():
        run(fn)

    # Execute immediately when used in a __main__ module, mirroring the
    # attribute macro's behavior.
    if fn.__module__ == "__main__":
        wrapper()
    return wrapper
