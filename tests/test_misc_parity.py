"""Remaining reference inline-test ports + repo hygiene.

- ColorMapper (reference nn/mod.rs:720-734)
- asset attribution walk (the analog of the reference's license-table test,
  crates/zaru/tests/misc.rs:7-52)
"""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from zaru_tpu.nn import ColorMapper

REPO = Path(__file__).resolve().parent.parent


class TestColorMapper:
    def test_reference_vectors(self):
        mapper = ColorMapper.linear(-1.0, 1.0)
        black = np.zeros((1, 1, 3), np.uint8)
        white = np.full((1, 1, 3), 255, np.uint8)
        np.testing.assert_allclose(np.asarray(mapper.map_array(jnp.asarray(black))), -1.0)
        np.testing.assert_allclose(np.asarray(mapper.map_array(jnp.asarray(white))), 1.0)

        mapper = ColorMapper.linear(1.0, 2.0)
        np.testing.assert_allclose(np.asarray(mapper.map_array(jnp.asarray(black))), 1.0)
        np.testing.assert_allclose(np.asarray(mapper.map_array(jnp.asarray(white))), 2.0)

    def test_rejects_empty_range(self):
        with pytest.raises(AssertionError):
            ColorMapper.linear(1.0, 1.0)


def test_every_asset_attributed():
    """Every file under assets/ must be mentioned in ATTRIBUTION.md
    (reference misc.rs walks 3rdparty/ against its license table)."""
    attribution = (REPO / "assets" / "ATTRIBUTION.md").read_text()
    missing = []
    for f in (REPO / "assets").rglob("*"):
        if f.is_dir() or f.name == "ATTRIBUTION.md":
            continue
        if f.name not in attribution:
            missing.append(str(f.relative_to(REPO)))
    assert not missing, f"unattributed assets: {missing}"


def test_no_reference_code_imports():
    """The framework must never import from the read-only reference mount
    (data assets via assets.py's documented fallback are the one allowed
    touchpoint)."""
    for py in (REPO / "zaru_tpu").rglob("*.py"):
        text = py.read_text()
        assert "/root/reference/crates" not in text, py
