"""Data filtering, averaging and smoothing.

TPU-native counterpart of reference crates/zaru/src/filter{.rs,/ema.rs,
/alpha_beta.rs,/one_euro.rs}.

Design: instead of per-variable boxed state objects (reference
filter.rs:40-58), every filter here is a *vectorized pure function* over
arbitrarily shaped state arrays. The same filter instance filters one scalar
or a whole ``[N_landmarks, 3]`` batch in one VPU-friendly op, and the
``(state, value) -> (state, out)`` signature makes every filter directly
usable inside ``jax.lax.scan`` / jitted tracker loops, with state carried on
device.

Uninitialized state is encoded with an ``init`` mask array rather than
``Option`` (reference EmaState.last: Option<f32>) so shapes stay static.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from typing import Any

import numpy as np

from .num import _xp

__all__ = [
    "Ema",
    "AlphaBetaFilter",
    "OneEuroFilter",
    "NoopFilter",
    "SimpleFilter",
    "TimedFilterAdapter",
]


class FilterParams:
    """Base class: parameters are data-independent; state is per-variable
    (reference filter.rs:36-58)."""

    time_based = False

    def init_state(self, shape=(), dtype=np.float32):
        raise NotImplementedError

    def apply(self, state, value):
        raise NotImplementedError


@dataclass(frozen=True)
class Ema(FilterParams):
    """Exponential moving average (reference filter/ema.rs:7-51).

    ``alpha`` near 1.0 favors recent values.
    """

    alpha: float

    def __post_init__(self):
        assert 0.0 <= self.alpha <= 1.0

    def init_state(self, shape=(), dtype=np.float32):
        xp = np
        return {
            "last": xp.zeros(shape, dtype),
            "init": xp.zeros(shape, bool),
        }

    def apply(self, state, value):
        xp = _xp(value)
        avg = self.alpha * value + (1.0 - self.alpha) * state["last"]
        out = xp.where(state["init"], avg, value)
        new_state = {"last": out, "init": xp.ones_like(state["init"])}
        return new_state, out


@dataclass(frozen=True)
class AlphaBetaFilter(FilterParams):
    """Alpha-beta filter predicting value + rate of change
    (reference filter/alpha_beta.rs:18-62)."""

    alpha: float
    beta: float
    time_based = True

    def __post_init__(self):
        assert 0.0 <= self.alpha <= 1.0
        assert 0.0 <= self.beta <= 1.0

    def init_state(self, shape=(), dtype=np.float32):
        return {
            "x": np.zeros(shape, dtype),
            "v": np.zeros(shape, dtype),
            "init": np.zeros(shape, bool),
        }

    def apply(self, state, value, elapsed):
        xp = _xp(value)
        prediction = state["x"] + state["v"] * elapsed
        residual = value - prediction
        x_new = prediction + self.alpha * residual
        # elapsed == 0 (duplicate timestamps happen in traced scans; see
        # OneEuroFilter's guard) must not divide by zero — one inf here
        # would poison the carried velocity into NaN forever. Hold the
        # previous velocity for a zero-dt sample.
        safe_dt = xp.where(elapsed > 0, elapsed, 1.0)
        v_upd = state["v"] + self.beta * residual / safe_dt
        v_new = xp.where(elapsed > 0, v_upd, state["v"])
        out = xp.where(state["init"], x_new, value)
        new_state = {
            "x": out,
            "v": xp.where(state["init"], v_new, state["v"]),
            "init": xp.ones_like(state["init"]),
        }
        return new_state, out


def _smoothing_factor(t_e, cutoff):
    r = 2.0 * math.pi * cutoff * t_e
    return r / (r + 1.0)


@dataclass(frozen=True)
class OneEuroFilter(FilterParams):
    """The 1€ filter (reference filter/one_euro.rs:13-98).

    - ``min_cutoff``: minimum cutoff frequency; lower = less jitter, more lag.
    - ``beta``: speed coefficient; higher = less lag.
    """

    min_cutoff: float
    beta: float
    d_cutoff: float = 1.0
    time_based = True

    def __post_init__(self):
        assert self.min_cutoff > 0.0
        assert self.beta >= 0.0

    def with_d_cutoff(self, d_cutoff: float) -> "OneEuroFilter":
        return OneEuroFilter(self.min_cutoff, self.beta, d_cutoff)

    def init_state(self, shape=(), dtype=np.float32):
        return {
            "x": np.zeros(shape, dtype),
            "dx": np.zeros(shape, dtype),
            "init": np.zeros(shape, bool),
        }

    def apply(self, state, value, elapsed):
        xp = _xp(value)
        # elapsed == 0 (two samples with the same timestamp) is a valid
        # call: no time has passed, so the derivative contributes nothing
        # and both smoothing factors collapse to 0 (output = previous
        # estimate). Guard the division explicitly instead of relying on
        # IEEE inf/nan propagation — this code also runs traced on device.
        pos = elapsed > 0
        a_d = _smoothing_factor(elapsed, self.d_cutoff)
        dx = xp.where(
            pos, (value - state["x"]) / xp.where(pos, elapsed, 1.0), 0.0
        )
        dx_hat = a_d * dx + (1.0 - a_d) * state["dx"]
        cutoff = self.min_cutoff + self.beta * xp.abs(dx_hat)
        a = _smoothing_factor(elapsed, cutoff)
        x_hat = a * value + (1.0 - a) * state["x"]

        out = xp.where(state["init"], x_hat, value)
        new_state = {
            "x": out,
            "dx": xp.where(state["init"], dx_hat, xp.zeros_like(dx_hat)),
            "init": xp.ones_like(state["init"]),
        }
        return new_state, out


@dataclass(frozen=True)
class NoopFilter(FilterParams):
    """Pass-through filter (reference filter.rs:153-180)."""

    def init_state(self, shape=(), dtype=np.float32):
        return {}

    def apply(self, state, value, elapsed=None):
        return state, value


class SimpleFilter:
    """Filter + state bundle for a single variable (reference
    filter.rs:117-151). For time-based filters, pass ``elapsed`` explicitly
    or wrap with :class:`TimedFilterAdapter`."""

    def __init__(self, params: FilterParams, shape=(), dtype=np.float32):
        self.params = params
        self._shape, self._dtype = shape, dtype
        self.state = params.init_state(shape, dtype)

    def filter(self, value, elapsed=None):
        if self.params.time_based:
            assert elapsed is not None, "time-based filter needs `elapsed`"
            self.state, out = self.params.apply(self.state, value, elapsed)
        else:
            self.state, out = self.params.apply(self.state, value)
        return out

    def set_params(self, params: FilterParams) -> None:
        self.params = params

    def reset_state(self) -> None:
        # Re-create with the CONSTRUCTED shape/dtype — inferring from the
        # live state dropped the dtype (silently reverting f64 state to
        # f32) and mapped empty (Noop) state to shape ().
        self.state = self.params.init_state(self._shape, self._dtype)


class TimedFilterAdapter:
    """Supplies wall-clock elapsed time to a time-based filter (reference
    filter.rs:91-115; unlike the reference, the timestamp resets on each
    call so `elapsed` is the per-measurement delta)."""

    def __init__(self, params: FilterParams, clock=time.monotonic):
        assert params.time_based
        self.params = params
        self._clock = clock
        self._last = clock()
        self.time_based = False

    def init_state(self, shape=(), dtype=np.float32):
        return self.params.init_state(shape, dtype)

    def apply(self, state, value):
        now = self._clock()
        elapsed = now - self._last
        self._last = now
        return self.params.apply(state, value, np.float32(elapsed))
