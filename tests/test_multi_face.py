"""Fused multi-face tracker: golden behavior on the fixture photo."""

import numpy as np
import pytest

import jax.numpy as jnp

from zaru_tpu.pipeline import MultiFaceTracker


@pytest.fixture(scope="module")
def tracker():
    return MultiFaceTracker(max_faces=3)


def test_tracks_single_face(tracker, sad_linus_full):
    frame = sad_linus_full.data
    state = tracker.init_state()
    for _ in range(3):
        state, out = tracker.run_frame(state, frame)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 1, valid
    slot = int(np.argmax(valid))
    assert float(out["confidence"][slot]) > 0.9
    pos = np.asarray(out["landmarks"][slot])
    assert pos.shape == (468, 3)
    w, h = sad_linus_full.width(), sad_linus_full.height()
    assert (pos[:, 0] > 0).all() and (pos[:, 0] < w).all()
    assert (pos[:, 1] > 0).all() and (pos[:, 1] < h).all()


def test_matches_single_face_tracker(tracker, sad_linus_full):
    """The slot tracker's landmarks agree with the single-face cascade."""
    from zaru_tpu.pipeline import FaceTracker

    frame = sad_linus_full.data
    state = tracker.init_state()
    for _ in range(3):
        state, out = tracker.run_frame(state, frame)
    slot = int(np.argmax(np.asarray(out["valid"])))
    multi = np.asarray(out["landmarks"][slot])[:, :2]

    single = FaceTracker(smooth=None)
    st = single.init_state()
    for _ in range(3):
        st, sout = single.run_frame(st, frame)
    ref = np.asarray(sout["landmarks"])[:, :2]
    err = np.abs(multi - ref)
    # The multi tracker seeds ROIs with the detection angle (like the
    # reference hand pipeline) while the single-face cascade seeds
    # angle-0 (like the facemesh example), so the fixed points differ
    # by a couple of pixels at the silhouette.
    assert err.mean() < 1.5, err.mean()
    assert err.max() < 5.0, err.max()


def test_loss_and_reacquire(tracker, sad_linus_full):
    frame = sad_linus_full.data
    state = tracker.init_state()
    state, out = tracker.run_frame(state, frame)
    assert np.asarray(out["valid"]).any()
    blank = jnp.zeros_like(frame)
    state, out = tracker.run_frame(state, blank)
    assert not np.asarray(out["valid"]).any()
    state, out = tracker.run_frame(state, frame)
    assert np.asarray(out["valid"]).any()


def test_slot_cnn_lowers_flat_batch():
    """Regression guard for the nested-vmap pessimization (BENCHMARKS
    "Nested vmap over CNNs"): the slot landmark CNN must see ONE flat
    [B*S] batch — its first conv consumes a tensor whose leading dim is
    B*S, not nested [B, S, ...] operands bracketed by per-op reshapes."""
    import re

    import jax
    import jax.numpy as jnp

    from zaru_tpu.pipeline import MultiFaceTracker

    tracker = MultiFaceTracker(max_faces=2)
    frames = jnp.zeros((4, 96, 128, 4), jnp.uint8)
    rois = jnp.tile(
        jnp.asarray([[40.0, 40.0, 30.0, 30.0, 0.0]], jnp.float32), (4, 2, 1)
    )
    txt = (
        jax.jit(tracker._track_slots_batch)
        .lower(tracker.params, frames, rois)
        .as_text()
    )
    # FaceMeshV1's first conv: 3 input channels at its 192x192 input,
    # batched flat over 4 streams x 2 slots = 8.
    assert re.search(r"stablehlo\.convolution.*tensor<8x3x192x192xf32>", txt), (
        "slot CNN is no longer applied as one flat [B*S] batch"
    )
