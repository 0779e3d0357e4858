"""The reference's tolerance policy (tests.zig:4-20), carried over verbatim:

if |expected| < 1e-3 -> absolute tolerance 5e-7, else relative tolerance 6e-4.
"""

import numpy as np

ABS_TOL = 5e-7
REL_TOL = 6e-4
SMALL = 1e-3

# End-to-end logits gate. "Bit-for-bit at FP32" (BASELINE.md) is not
# achievable across different BLAS implementations — torch CPU sgemm and XLA
# reassociate reductions differently. Measured floor on GPT2_NANO (2 layers,
# fp32, highest matmul precision): max |Δlogit| = 6.2e-6 independent of
# LayerNorm/GELU formulation (see PARITY.md). The e2e gate is therefore a
# combined abs+rel bound ~16x above that floor.
E2E_ATOL = 1e-4
E2E_RTOL = 2e-3


def assert_tensors_close(actual, expected, abs_tol=ABS_TOL, rel_tol=REL_TOL, msg=""):
    actual = np.asarray(actual, dtype=np.float32)
    expected = np.asarray(expected, dtype=np.float32)
    assert actual.shape == expected.shape, f"{msg} shape {actual.shape} != {expected.shape}"
    small = np.abs(expected) < SMALL
    abs_err = np.abs(actual - expected)
    rel_err = abs_err / np.maximum(np.abs(expected), 1e-30)
    ok = np.where(small, abs_err <= abs_tol, rel_err <= rel_tol)
    _raise_if_bad(ok, actual, expected, abs_err, rel_err, msg)


def assert_logits_close(actual, expected, atol=E2E_ATOL, rtol=E2E_RTOL, msg=""):
    """np.allclose-style combined gate for end-to-end logits parity."""
    actual = np.asarray(actual, dtype=np.float32)
    expected = np.asarray(expected, dtype=np.float32)
    assert actual.shape == expected.shape, f"{msg} shape {actual.shape} != {expected.shape}"
    abs_err = np.abs(actual - expected)
    rel_err = abs_err / np.maximum(np.abs(expected), 1e-30)
    ok = abs_err <= atol + rtol * np.abs(expected)
    _raise_if_bad(ok, actual, expected, abs_err, rel_err, msg)


def _raise_if_bad(ok, actual, expected, abs_err, rel_err, msg):
    if not ok.all():
        bad = np.argwhere(~ok)
        i = tuple(bad[0])
        raise AssertionError(
            f"{msg} {int((~ok).sum())}/{ok.size} elements out of tolerance; "
            f"first at {i}: actual={actual[i]!r} expected={expected[i]!r} "
            f"abs_err={abs_err[i]:.3e} rel_err={rel_err[i]:.3e}"
        )
