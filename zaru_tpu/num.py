"""Small numeric utilities.

TPU-native counterpart of the reference's numeric helpers
(reference: crates/zaru/src/num.rs, crates/zaru/src/slice.rs,
crates/zaru/src/iter.rs). All functions here are dtype-preserving and work on
both NumPy arrays (host path) and JAX arrays (traced/jitted path).
"""

from __future__ import annotations

import numpy as np


def _xp(x):
    """Return the array namespace (numpy or jax.numpy) for ``x``."""
    if isinstance(x, np.ndarray) or np.isscalar(x) or isinstance(x, (float, int)):
        return np
    import jax.numpy as jnp

    return jnp


def sigmoid(x):
    """Numerically stable logistic sigmoid
    (reference: crates/zaru/src/num.rs ``sigmoid``)."""
    xp = _xp(x)
    pos = xp.where(x >= 0, x, 0.0)
    neg = xp.where(x < 0, x, 0.0)
    return xp.where(x >= 0, 1.0 / (1.0 + xp.exp(-pos)), xp.exp(neg) / (1.0 + xp.exp(neg)))


def round_half_away(x):
    """Round half away from zero — the semantics of Rust's ``f32::round``.

    ``jnp.round``/``np.round`` round half to even, which would break bit-level
    parity with the reference's pixel-coordinate rounding
    (reference: crates/zaru/src/nn/mod.rs:54-58, image/mod.rs:224-238).
    """
    xp = _xp(x)
    return xp.sign(x) * xp.floor(xp.abs(x) + 0.5)


def total_f32_key(x: float) -> int:
    """Sort key implementing the IEEE 754 totalOrder predicate, like the
    reference's ``TotalF32`` / ``f32::total_cmp``
    (crates/zaru-image/src/num.rs:5-27): -NaN < -inf < … < -0.0 < +0.0
    < … < +inf < +NaN. The standard bit trick: reinterpret as i32, then
    flip all-but-sign for negatives / set the sign for non-negatives so
    unsigned comparison is the total order."""
    bits = int(np.float32(x).view(np.uint32))
    if bits & 0x8000_0000:
        return 0xFFFF_FFFF - bits
    return bits | 0x1_0000_0000
