"""Reference-contract tests for the numeric utility layer (round-5
review findings): IEEE totalOrder sorting (num.rs TotalF32), and the
ApproxEq asserter's OR semantics / NaN handling / default tolerances
(zaru-linalg approx.rs)."""

import math

import numpy as np
import pytest

from zaru_tpu.approx import assert_approx_eq, ulps_diff_eq
from zaru_tpu.num import total_f32_key


class TestTotalOrder:
    def test_ieee_total_order(self):
        """f32::total_cmp ordering: -NaN < -inf < -1 < -0.0 < +0.0 < 1
        < +inf < +NaN (num.rs:5-27)."""
        neg_nan = np.float32(np.frombuffer(
            np.uint32(0xFFC00000).tobytes(), np.float32)[0])
        pos_nan = np.float32(np.frombuffer(
            np.uint32(0x7FC00000).tobytes(), np.float32)[0])
        vals = [1.0, math.inf, -math.inf, -0.0, 0.0, -1.0, pos_nan, neg_nan]
        got = sorted(vals, key=total_f32_key)
        keys = [total_f32_key(v) for v in got]
        assert keys == sorted(keys)
        assert math.isnan(got[0]) and np.signbit(got[0])  # -NaN first
        assert got[1] == -math.inf and got[2] == -1.0
        assert got[3] == 0.0 and np.signbit(got[3])  # -0.0 before +0.0
        assert got[4] == 0.0 and not np.signbit(got[4])
        assert got[5] == 1.0 and got[6] == math.inf
        assert math.isnan(got[-1]) and not np.signbit(got[-1])  # +NaN last

    def test_negative_nan_sorts_lowest_for_nms(self):
        """The NMS seed ordering consequence: a -NaN confidence must be
        the LOWEST priority, not the highest."""
        neg_nan = np.frombuffer(np.uint32(0xFFC00000).tobytes(), np.float32)[0]
        confs = [0.9, 0.2, float(neg_nan)]
        ordered = sorted(confs, key=total_f32_key)
        assert math.isnan(ordered[0])
        assert ordered[1:] == [0.2, 0.9]


class TestApproxEq:
    def test_or_semantics(self):
        """Any supplied comparison passing means equal (approx.rs
        Asserter::equal): abs passes here while ulps alone would fail."""
        assert_approx_eq(1.0, 1.0005, abs=1e-3, ulps=4)

    def test_all_supplied_comparisons_fail(self):
        with pytest.raises(AssertionError):
            assert_approx_eq(1.0, 1.1, abs=1e-3, ulps=4)

    def test_default_matches_reference_epsilon(self):
        """Defaults are abs=eps OR rel=eps (approx.rs:59-60): one-ULP
        neighbors of 1.0 pass, 1.00005 does not; near-zero values pass
        via the abs term."""
        eps = float(np.finfo(np.float32).eps)
        assert_approx_eq(1.0, 1.0 + eps)
        assert_approx_eq(0.0, 1e-9)  # reference passes via abs=EPSILON
        with pytest.raises(AssertionError):
            assert_approx_eq(1.0, 1.00005)

    def test_ulps_nan_never_equal(self):
        """approx.rs: 'NaN is never considered equal to anything' — not
        even a bit-identical NaN."""
        nan = np.float32("nan")
        assert not ulps_diff_eq(nan, nan, 0)
        with pytest.raises(AssertionError):
            assert_approx_eq(nan, nan, ulps=0)

    def test_ulps_signed_zeros_equal(self):
        assert ulps_diff_eq(np.float32(-0.0), np.float32(0.0), 0)
