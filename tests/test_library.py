"""Candidate-library math vs. independent oracles and closed forms."""

import numpy as np
import pytest

import jax.numpy as jnp

from desmo_tpu import library
from oracles import num_terms_oracle, pool_data_oracle


@pytest.mark.parametrize(
    "r,p,expected",
    [
        (4, 3, 35),  # cylinder: DESMO/cylinder_flow/DESMO.out:7
        (4, 2, 15),  # aneurysm & channel: DESMO/aneurysm/DESMO.out:7
        (2, 2, 6),  # Fourier variants: DESMO_Fourier/*/DESMO.out:7
        (2, 3, 10),
        (1, 7, 8),
        (5, 1, 6),
    ],
)
def test_num_poly_terms(r, p, expected):
    assert library.num_poly_terms(r, p) == expected
    assert num_terms_oracle(r, p) == expected


@pytest.mark.parametrize("r,p", [(4, 3), (4, 2), (2, 2), (3, 4), (2, 7), (1, 3), (5, 2)])
def test_eval_library_matches_oracle(r, p):
    rng = np.random.default_rng(0)
    phi = rng.standard_normal((17, r)).astype(np.float32)
    factors = library.factor_table(r, p)
    assert factors.shape == (library.num_poly_terms(r, p), p)
    theta = np.asarray(library.eval_library(jnp.asarray(phi), factors))
    oracle = pool_data_oracle(phi.astype(np.float64), r, p)
    np.testing.assert_allclose(theta, oracle, rtol=1e-5, atol=1e-6)


def test_exponents_sum_to_degree_order():
    E = library.monomial_exponents(4, 3)
    degrees = E.sum(axis=1)
    # degree-ascending blocks
    assert (np.diff(degrees) >= 0).all()
    assert degrees[0] == 0 and degrees[-1] == 3
    # factor table and exponent matrix describe the same monomials
    F = library.factor_table(4, 3)
    E2 = np.zeros_like(E)
    for t in range(F.shape[0]):
        for f in F[t]:
            if f > 0:
                E2[t, f - 1] += 1
    np.testing.assert_array_equal(E, E2)


def test_term_names_reference_order():
    names = library.poly_term_names(4, 3)
    assert names[0] == "1"
    assert names[1:5] == ["phi1", "phi2", "phi3", "phi4"]
    assert names[5] == "phi1^2"
    assert names[6] == "phi1*phi2"
    assert len(names) == 35
    assert names[-1] == "phi4^3"
    trig = library.trig_term_names(2)
    assert trig == ["sin(phi1)", "sin(phi2)", "cos(phi1)", "cos(phi2)", "tanh(phi1)", "tanh(phi2)"]
    inter = library.ref_interleaved_trig_names(2)
    assert inter == ["sin(phi1)", "cos(phi1)", "tanh(phi1)", "sin(phi2)", "cos(phi2)", "tanh(phi2)"]


def test_gradient_safe_at_zero_modes():
    """x**0 power-rule NaNs are why we gather instead of exponentiate."""
    import jax

    factors = library.factor_table(2, 3)

    def f(phi):
        return jnp.sum(library.eval_library(phi, factors))

    g = jax.grad(f)(jnp.zeros((5, 2)))
    assert np.isfinite(np.asarray(g)).all()
