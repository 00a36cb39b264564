"""Golden tests: polarization operations vs oracle (exact)."""
import numpy as np
import pytest

import oracle
from sarpro_tpu.core import ops


@pytest.mark.parametrize("op", ["sum", "diff", "ratio", "n-diff", "log-ratio"])
def test_ops_match_oracle(rng, op):
    a = rng.lognormal(5.0, 1.0, (32, 48)).astype(np.float32)
    b = rng.lognormal(4.0, 1.0, (32, 48)).astype(np.float32)
    b[rng.random((32, 48)) < 0.1] = 0.0  # exercise zero guards
    got = np.asarray(ops.OPERATIONS[op](a, b))
    want = oracle.pol_ops(a, b, op)
    if op in ("ratio", "n-diff", "log-ratio"):
        # XLA may emit reciprocal-multiply division: 1 ulp from IEEE divide
        np.testing.assert_allclose(got, want, rtol=2e-7, atol=0)
        np.testing.assert_array_equal(got == 0.0, want == 0.0)  # zero guards exact
    else:
        np.testing.assert_array_equal(got, want)


def test_log_ratio_equals_ratio_quirk(rng):
    """Deliberately preserved: log-ratio emits the plain linear ratio
    (reference: ops.rs:34-44)."""
    a = rng.lognormal(5.0, 1.0, (8, 8)).astype(np.float32)
    b = rng.lognormal(4.0, 1.0, (8, 8)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(ops.log_ratio_arrays(a, b)), np.asarray(ops.ratio_arrays(a, b))
    )


def test_ndiff_zero_denominator():
    a = np.array([[1.0, 0.0]], np.float32)
    b = np.array([[-1.0, 0.0]], np.float32)
    got = np.asarray(ops.normalized_diff_arrays(a, b))
    np.testing.assert_array_equal(got, np.zeros((1, 2), np.float32))
