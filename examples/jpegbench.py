"""JPEG decode benchmark across backends (reference: examples/jpegbench.rs).

Usage: python jpegbench.py <file.jpg> [iterations]
"""

import os
import sys
import time

from _common import frame_source  # noqa: F401  (path setup)

from zaru_tpu import gui
from zaru_tpu.assets import fixture_path
from zaru_tpu.image import decode as idec


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else fixture_path("sad_linus.jpg")
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    data = open(path, "rb").read()

    for backend in ("cv2", "pil", "native"):
        # Honest rows only: decode.py silently falls back to cv2 when
        # PIL is absent (a 'pil' row would report cv2 numbers), and the
        # native backend raises NativeUnavailable where the toolchain is
        # missing — both become a 'skipped' row, not a lie or a crash.
        if backend == "pil":
            try:
                import PIL  # noqa: F401
            except ImportError:
                print(f"{backend:>7}: skipped (PIL not installed)")
                continue
        os.environ["ZARU_TPU_JPEG_BACKEND"] = backend
        try:
            idec.decode_jpeg(data)  # warmup / availability check
        except RuntimeError as e:  # NativeUnavailable subclasses this
            print(f"{backend:>7}: skipped ({e})")
            continue
        t0 = time.perf_counter()
        for _ in range(iters):
            rgb = idec.decode_jpeg(data)
        dt = (time.perf_counter() - t0) / iters
        mp = rgb.shape[0] * rgb.shape[1] / 1e6
        print(f"{backend:>7}: {dt * 1e3:7.2f} ms/frame  ({mp / dt:6.1f} MP/s)")


if __name__ == "__main__":
    gui.run(main)
