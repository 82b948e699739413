"""Filter math tests with the reference's hand-computed sequences
(reference: filter/ema.rs:53-66, filter/alpha_beta.rs:65-82,
filter/one_euro.rs)."""

import numpy as np
import pytest

from zaru_tpu.filters import (
    AlphaBetaFilter,
    Ema,
    NoopFilter,
    OneEuroFilter,
    SimpleFilter,
)


def test_ema_reference_sequence():
    f = SimpleFilter(Ema(0.5))
    assert f.filter(1.0) == 1.0
    assert f.filter(2.0) == 1.5
    assert f.filter(2.0) == 1.75


def test_alpha_beta_reference_sequence():
    f = SimpleFilter(AlphaBetaFilter(0.5, 0.1))
    for _ in range(4):
        assert f.filter(10.0, elapsed=0.2) == 10.0
    assert f.filter(-10.0, elapsed=0.2) == pytest.approx(0.0)
    assert f.filter(-10.0, elapsed=0.2) == pytest.approx(-6.0)
    assert f.filter(-10.0, elapsed=0.2) == pytest.approx(-9.4, abs=1e-5)


def test_alpha_beta_zero_elapsed_does_not_poison_velocity():
    """A zero-dt sample (duplicate timestamps happen in traced scans)
    must not divide by zero — one inf would NaN every later estimate."""
    import numpy as np

    f = SimpleFilter(AlphaBetaFilter(0.5, 0.1))
    f.filter(1.0, elapsed=0.016)
    out0 = f.filter(2.0, elapsed=0.0)
    assert np.isfinite(out0)
    for _ in range(3):
        out = f.filter(2.0, elapsed=0.016)
        assert np.isfinite(out)
    assert out == pytest.approx(2.0, abs=0.5)


def test_simple_filter_reset_keeps_shape_and_dtype():
    import numpy as np

    f = SimpleFilter(AlphaBetaFilter(0.5, 0.1), shape=(3,), dtype=np.float64)
    f.filter(np.ones(3), elapsed=0.1)
    f.reset_state()
    assert f.state["x"].shape == (3,) and f.state["x"].dtype == np.float64


def test_one_euro_first_value_passthrough():
    f = SimpleFilter(OneEuroFilter(min_cutoff=1.0, beta=0.0))
    assert f.filter(5.0, elapsed=0.0) == 5.0


def test_one_euro_zero_elapsed_after_init():
    """elapsed=0 on an initialized filter must hold the previous estimate
    (no time passed), with no division-by-zero warnings/NaNs."""
    import warnings

    f = SimpleFilter(OneEuroFilter(min_cutoff=1.0, beta=0.5))
    f.filter(5.0, elapsed=1 / 30.0)
    smoothed = f.filter(6.0, elapsed=1 / 30.0)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = f.filter(100.0, elapsed=0.0)
    assert np.isfinite(out)
    assert out == pytest.approx(smoothed)
    # And the filter keeps working afterwards.
    assert np.isfinite(f.filter(6.0, elapsed=1 / 30.0))


def test_one_euro_smooths_jitter():
    f = SimpleFilter(OneEuroFilter(min_cutoff=0.1, beta=0.0))
    rng = np.random.default_rng(3)
    noisy = 10.0 + rng.normal(0, 1.0, 100).astype(np.float32)
    outs = [f.filter(float(v), elapsed=1 / 30.0) for v in noisy]
    # Output variance should be much smaller than input variance.
    assert np.var(outs[50:]) < 0.3 * np.var(noisy[50:])


def test_one_euro_tracks_fast_motion():
    slow = SimpleFilter(OneEuroFilter(min_cutoff=0.1, beta=0.0))
    fast = SimpleFilter(OneEuroFilter(min_cutoff=0.1, beta=5.0))
    ramp = np.linspace(0, 100, 60)
    for v in ramp:
        s = slow.filter(float(v), elapsed=1 / 30.0)
        fa = fast.filter(float(v), elapsed=1 / 30.0)
    # High beta follows the ramp more closely.
    assert abs(fa - 100.0) < abs(s - 100.0)


def test_vectorized_state():
    # One parameter set filtering a [468, 3] landmark batch at once.
    f = Ema(0.5)
    state = f.init_state((4, 3))
    x0 = np.ones((4, 3), np.float32)
    state, out0 = f.apply(state, x0)
    np.testing.assert_array_equal(out0, x0)
    state, out1 = f.apply(state, 2 * x0)
    np.testing.assert_allclose(out1, 1.5 * x0)


def test_filters_traceable_under_jit():
    import jax
    import jax.numpy as jnp

    f = OneEuroFilter(min_cutoff=1.0, beta=0.5)
    state = {k: jnp.asarray(v) for k, v in f.init_state((3,)).items()}

    @jax.jit
    def step(state, v):
        return f.apply(state, v, 1 / 30.0)

    out = None
    for v in (1.0, 2.0, 3.0):
        state, out = step(state, jnp.full((3,), v))
    assert out.shape == (3,)
    assert bool(jnp.all(out > 1.0)) and bool(jnp.all(out < 3.0))


def test_noop():
    f = SimpleFilter(NoopFilter())
    assert f.filter(42.0) == 42.0
