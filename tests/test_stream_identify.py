"""Fused batched tracking + identification (face/identify.StreamIdentifier)."""

import numpy as np
import pytest

import jax.numpy as jnp

from zaru_tpu.assets import fixture_path
from zaru_tpu.face.identify import FaceIdentifier, StreamIdentifier
from zaru_tpu.image import Image


@pytest.fixture(scope="module")
def enrolled():
    ident = FaceIdentifier()
    assert ident.enroll("linus", Image.load(fixture_path("sad_linus_cropped.jpg")))
    return ident


@pytest.fixture(scope="module")
def frames():
    img = Image.load(fixture_path("sad_linus.jpg"))
    return jnp.stack([jnp.asarray(img.data)] * 2)


def test_stream_identity_matches_enrolled(enrolled, frames):
    sid = StreamIdentifier()
    sid.adopt(enrolled)
    state = sid.init_state(batch=2)
    for _ in range(2):
        state, out = sid.run_frames(state, frames)
    assert bool(np.asarray(out["valid"]).all())
    ident = np.asarray(out["identity"])
    dist = np.asarray(out["identity_distance"])
    # Same person, different photo: unit-sphere distance well under 1.0.
    assert (ident == 0).all(), (ident, dist)
    assert (dist < 1.0).all(), dist
    assert [sid.names[i] for i in ident] == ["linus", "linus"]
    # Embeddings are L2-normalized.
    norms = np.linalg.norm(np.asarray(out["embedding"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_stream_identity_threshold_rejects(enrolled, frames):
    sid = StreamIdentifier(threshold=0.05)
    sid.adopt(enrolled)
    state = sid.init_state(batch=2)
    state, out = sid.run_frames(state, frames)
    # Cross-photo distance exceeds a 0.05 threshold -> unidentified, but
    # the distance is still reported.
    assert (np.asarray(out["identity"]) == -1).all()
    assert np.isfinite(np.asarray(out["identity_distance"])).all()


def test_empty_gallery(frames):
    sid = StreamIdentifier()
    state = sid.init_state(batch=2)
    state, out = sid.run_frames(state, frames)
    assert (np.asarray(out["identity"]) == -1).all()
    assert np.isinf(np.asarray(out["identity_distance"])).all()
