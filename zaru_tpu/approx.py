"""Approximate float comparison with abs/rel/ULP tolerances.

TPU-native counterpart of reference crates/zaru-linalg/src/approx.rs
(`ApproxEq` + `assert_approx_eq!`). Operates on scalars and arrays.
"""

from __future__ import annotations

import numpy as np


def abs_diff_eq(a, b, abs_tolerance) -> bool:
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return bool(np.all(np.abs(a - b) <= abs_tolerance))


def rel_diff_eq(a, b, rel_tolerance) -> bool:
    """Relative comparison against the larger magnitude (approx.rs)."""
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    scale = np.maximum(np.abs(a), np.abs(b))
    return bool(np.all(np.abs(a - b) <= rel_tolerance * scale))


def ulps_diff_eq(a, b, ulps_tolerance: int) -> bool:
    """Units-in-last-place comparison on float32 bit patterns."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    ai = a.view(np.int32).astype(np.int64)
    bi = b.view(np.int32).astype(np.int64)
    # Map negative floats to a monotonic integer line.
    ai = np.where(ai < 0, np.int64(-(2**31)) - ai, ai)
    bi = np.where(bi < 0, np.int64(-(2**31)) - bi, bi)
    same_sign = (a < 0) == (b < 0)
    return bool(np.all(same_sign & (np.abs(ai - bi) <= ulps_tolerance)))


def assert_approx_eq(a, b, abs=None, rel=None, ulps=None, msg=""):
    """Assert approximate equality; defaults to rel=1e-4 like the reference's
    `assert_approx_eq!` default relative tolerance (approx.rs:13-43)."""
    if abs is None and rel is None and ulps is None:
        rel = 1e-4
    ok = True
    if abs is not None:
        ok = ok and abs_diff_eq(a, b, abs)
    if rel is not None:
        ok = ok and rel_diff_eq(a, b, rel)
    if ulps is not None:
        ok = ok and ulps_diff_eq(a, b, ulps)
    if not ok:
        raise AssertionError(f"assert_approx_eq failed: {a!r} !~ {b!r} {msg}")
