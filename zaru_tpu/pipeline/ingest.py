"""Host→device frame ingest.

SURVEY.md §7 lists HBM ingress as a hard part: 2,000×1080p fps ≈ 16 GB/s of
uint8 RGBA. The strategy here:

- frames transfer as **uint8** (4 B/px; color mapping happens on device
  inside the fused sampler — never upload f32),
- frames batch into one contiguous ``[B,H,W,4]`` array per transfer,
- ``device_put`` is asynchronous, so a double-buffered uploader overlaps
  the host copy of batch N+1 with the device compute of batch N.

`measure_ingest_bandwidth` quantifies the achievable rate on the current
host/device link.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["FrameUploader", "measure_ingest_bandwidth"]


class FrameUploader:
    """Double-buffered batched frame uploader.

    Usage::

        up = FrameUploader(batch=8, shape=(1080, 1920, 4))
        up.stage(i, frame_np)     # fill slots of the *staging* batch
        frames = up.flush()       # async upload; returns device array
    """

    def __init__(self, batch: int, shape: tuple[int, int, int], device=None):
        self.batch = batch
        self.shape = shape
        self.device = device or jax.devices()[0]
        # Two pinned host staging buffers, swapped on flush.
        self._staging = [
            np.zeros((batch, *shape), np.uint8) for _ in range(2)
        ]
        self._cur = 0
        self._in_flight = None

    def stage(self, slot: int, frame: np.ndarray) -> None:
        self._staging[self._cur][slot] = frame

    def flush(self):
        """Starts the async upload of the staged batch and returns the
        device array; the previous upload (if any) is awaited first so at
        most one transfer is in flight.

        Fence caveat (tunneled devices): ``block_until_ready`` returns
        early through the axon tunnel (CLAUDE.md), so on THIS box it is
        only a local-device fence. The serving loop is still safe
        because it performs a real device→host readback of every step's
        outputs before staging the next batch — the step consumed this
        buffer, so its transfer necessarily landed. Callers that skip
        per-step readbacks on a tunneled device should force one
        (np.asarray of any result) before re-staging a buffer."""
        if self._in_flight is not None:
            self._in_flight.block_until_ready()
        buf = self._staging[self._cur]
        self._in_flight = jax.device_put(buf, self.device)
        self._cur ^= 1
        return self._in_flight


def measure_ingest_bandwidth(
    batch: int = 8, shape=(1080, 1920, 4), iters: int = 20
) -> dict:
    """Measures sustained host→device upload throughput for uint8 frame
    batches. Returns {"gbytes_per_s", "frames_per_s"}.

    Completion is forced with a real device→host readback of a 1-element
    reduction over the uploaded bytes: through tunneled devices,
    ``block_until_ready`` returns before the transfer lands (CLAUDE.md),
    so a bare device_put loop would time async enqueue.
    """
    rng = np.random.default_rng(0)
    bufs = [
        rng.integers(0, 256, (batch, *shape), dtype=np.uint8) for _ in range(2)
    ]
    dev = jax.devices()[0]
    touch = jax.jit(lambda x: jnp.sum(x[:, ::97, ::97].astype(jnp.int32)))
    # Warmup (also compiles the touch reduction).
    np.asarray(touch(jax.device_put(bufs[0], dev)))

    t0 = time.perf_counter()
    for i in range(iters):
        np.asarray(touch(jax.device_put(bufs[i % 2], dev)))
    dt = time.perf_counter() - t0
    nbytes = batch * int(np.prod(shape)) * iters
    return {
        "gbytes_per_s": nbytes / dt / 1e9,
        "frames_per_s": batch * iters / dt,
    }
