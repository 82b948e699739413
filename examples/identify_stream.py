"""Fused batched stream identification demo.

Enrolls faces from images (name = file stem), then tracks AND identifies
every stream of a batch per frame in one jitted device step
(face/identify.StreamIdentifier): gated fast-path cascade + MXU-sampled
112x112 crops + one batched MobileFaceNet pass + on-device gallery match.

Usage:
  python identify_stream.py <enroll-img> [<enroll-img> ...] [--stream IMG]
                            [--batch N] [--frames N]

Defaults: enrolls the cropped fixture, streams the full fixture (same
person → expect a match with unit-sphere distance ~0.4).
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

from _common import frame_source  # noqa: F401  (path setup)

import jax.numpy as jnp

from zaru_tpu.assets import fixture_path
from zaru_tpu.face.identify import FaceIdentifier, StreamIdentifier
from zaru_tpu.image import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("enroll", nargs="*", help="images to enroll (name = stem)")
    ap.add_argument("--stream", help="image to run as the stream frames")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=4)
    args = ap.parse_args()

    enroll = args.enroll or [str(fixture_path("sad_linus_cropped.jpg"))]
    stream = args.stream or str(fixture_path("sad_linus.jpg"))

    ident = FaceIdentifier()
    for p in enroll:
        ok = ident.enroll(Path(p).stem, Image.load(p))
        print(f"enroll {Path(p).stem}: {'ok' if ok else 'NO FACE'}")
    if not len(ident):
        print("nothing enrolled", file=sys.stderr)
        return 1

    sid = StreamIdentifier()
    sid.adopt(ident)
    frames = jnp.stack([jnp.asarray(Image.load(stream).data)] * args.batch)
    state = sid.init_state(batch=args.batch)

    for t in range(args.frames):
        t0 = time.perf_counter()
        state, out = sid.run_frames(state, frames)
        idents = np.asarray(out["identity"])
        dists = np.asarray(out["identity_distance"])
        dt = time.perf_counter() - t0
        names = [sid.names[i] if i >= 0 else "<unknown>" for i in idents]
        print(f"frame {t}: {list(zip(names, dists.round(3).tolist()))} "
              f"({dt * 1e3:.1f} ms)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
