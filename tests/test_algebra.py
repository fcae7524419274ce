"""Polynomial algebra tests (oracle: reference tests/test_algebra.py, plus
NTT round-trip and arkworks-domain property checks)."""

import pytest
from zksnake_tpu.constant import BN254_SCALAR_FIELD, BLS12_381_SCALAR_FIELD
from zksnake_tpu.polynomial import (
    Polynomial,
    fft,
    ifft,
    coset_fft,
    coset_ifft,
    get_all_evaluation_points,
    evaluate_lagrange_coefficients,
    evaluate_vanishing_polynomial,
)


def test_univariate_polynomial():
    for p in (BN254_SCALAR_FIELD, BLS12_381_SCALAR_FIELD):
        a = Polynomial([1, 2, 3], p)
        b = Polynomial([2, 3, 4], p)

        assert a + b == Polynomial([x + y for x, y in zip(a.coeffs(), b.coeffs())], p)
        assert b - a == Polynomial(
            [x - y % p for x, y in zip(b.coeffs(), a.coeffs())], p
        )
        assert a * b == Polynomial([2, 7, 16, 17, 12], p)
        assert (a * b / a)[0] == b
        assert (a * b / b)[0] == a

        assert a + 5 == Polynomial([6, 2, 3], p)
        assert a - 1 == Polynomial([0, 2, 3], p)
        assert a * 2 == Polynomial([2, 4, 6], p)

        assert a(2) == (1 + 2 * 2 + 2**2 * 3) % p
        assert b(2) == (2 + 2 * 3 + 2**2 * 4) % p


def test_multivariate_polynomial():
    for p in (BN254_SCALAR_FIELD, BLS12_381_SCALAR_FIELD):
        # 3x + 2y
        a = Polynomial({(1, 0): 3, (0, 1): 2}, p)
        # 5x + 7y
        b = Polynomial({(1, 0): 5, (0, 1): 7}, p)

        assert a + b == Polynomial({(0, 1): 9, (1, 0): 8}, p)
        assert b - a == Polynomial({(0, 1): 5, (1, 0): 2}, p)
        assert a * b == Polynomial({(0, 2): 14, (1, 1): 31, (2, 0): 15}, p)

        assert a + 5 == Polynomial({(1, 0): 3, (0, 1): 2, (0, 0): 5}, p)
        assert a - 1 == Polynomial({(1, 0): 3, (0, 1): 2, (0, 0): p - 1}, p)
        assert a * 2 == Polynomial({(1, 0): 6, (0, 1): 4}, p)

        assert a([5, 10]) == (3 * 5 + 2 * 10) % p
        assert b([5, 10]) == (5 * 5 + 7 * 10) % p


def test_ntt_matches_direct_evaluation():
    """fft must produce f(omega^i) in natural order (arkworks convention)."""
    for p in (BN254_SCALAR_FIELD, BLS12_381_SCALAR_FIELD):
        coeffs = [3, 1, 4, 1, 5, 9, 2, 6]
        evals = fft(coeffs, p)
        roots = get_all_evaluation_points(8, p)
        poly = Polynomial(coeffs, p)
        assert evals == [poly(w) for w in roots]
        assert ifft(evals, p) == coeffs


def test_coset_fft_is_omega_offset():
    """Reference quirk: the 'coset' uses offset == omega itself, i.e.
    evaluation at omega^(i+1) (src/bn254/polynomial.rs:553-556)."""
    p = BN254_SCALAR_FIELD
    coeffs = [7, 0, 2, 5]
    roots = get_all_evaluation_points(4, p)
    omega = roots[1]
    poly = Polynomial(coeffs, p)
    evals = coset_fft(coeffs, p)
    assert evals == [poly(omega * w % p) for w in roots]
    assert coset_ifft(evals, p) == coeffs


def test_lagrange_and_vanishing():
    p = BN254_SCALAR_FIELD
    n = 8
    tau = 123456789
    coeffs = evaluate_lagrange_coefficients(n, tau, p)
    # sum of Lagrange coefficients at any point is 1
    assert sum(coeffs) % p == 1
    # interpolation property: sum L_i(tau) * f(w_i) == f(tau)
    roots = get_all_evaluation_points(n, p)
    poly = Polynomial([5, 4, 3, 2, 1], p)
    lhs = sum(c * poly(w) for c, w in zip(coeffs, roots)) % p
    assert lhs == poly(tau)
    assert evaluate_vanishing_polynomial(n, tau, p) == (pow(tau, n, p) - 1) % p


def test_vanishing_poly_mul_div_roundtrip():
    p = BN254_SCALAR_FIELD
    f = Polynomial([1, 2, 3, 4], p)
    fz = f.multiply_by_vanishing_poly()
    q, r = fz.divide_by_vanishing_poly()
    assert r.is_zero()
    assert q == f
