"""DESMO-SR: STLSQ identification, simulation, channel extraction/injection."""

import numpy as np
import pytest

import jax.numpy as jnp

from desmo_tpu import sr
from desmo_tpu.models import desmo


def test_stlsq_recovers_linear_oscillator():
    """dz/dt = [[0, w], [-w, 0]] z with degree-1 library must be recovered."""
    w = 1.7
    t = np.linspace(0, 20, 2000)
    z = np.stack([np.sin(w * t), np.cos(w * t)], axis=1)
    model = sr.fit_sindy(z, t, degree=1, threshold=0.05, alpha=1e-6)
    # features: [1, z1, z2]
    np.testing.assert_allclose(model.coefficients[0], [0.0, 0.0, w], atol=2e-2)
    np.testing.assert_allclose(model.coefficients[1], [0.0, -w, 0.0], atol=2e-2)
    eqs = model.equations()
    assert "z2" in eqs[0] and "z1" in eqs[1]


def test_stlsq_sparsifies_with_larger_library():
    """Oscillator data against a degree-2 library: the quadratic terms must be
    thresholded away and the linear rotation recovered."""
    w = 1.7
    t = np.linspace(0, 20, 4000)
    z = np.stack([np.sin(w * t), np.cos(w * t)], axis=1)
    model = sr.fit_sindy(z, t, degree=2, threshold=0.05, alpha=1e-8)
    names = model.feature_names
    i1, i2 = names.index("z1"), names.index("z2")
    assert abs(model.coefficients[0][i2] - w) < 0.02
    assert abs(model.coefficients[1][i1] + w) < 0.02
    # everything else (constant + 3 quadratics per row) zeroed
    nonzero = np.sum(model.coefficients != 0)
    assert nonzero == 2


def test_simulate_matches_truth():
    w = 2.0
    t = np.linspace(0, 10, 1000)

    def rhs(z):
        return np.array([w * z[1], -w * z[0]])

    z = sr.simulate(rhs, np.array([0.0, 1.0]), t)
    np.testing.assert_allclose(z[:, 0], np.sin(w * t), atol=1e-3)
    np.testing.assert_allclose(z[:, 1], np.cos(w * t), atol=1e-3)


def test_fit_then_simulate_closed_loop():
    """End-to-end: fit the oscillator, integrate it, compare trajectories —
    the reference's SINDy.simulate step (...py:1030-1051)."""
    w = 1.3
    t = np.linspace(0, 30, 3000)
    z = np.stack([np.sin(w * t), np.cos(w * t)], axis=1)
    model = sr.fit_sindy(z, t, degree=1, threshold=0.05, alpha=1e-6)
    z_sim = sr.simulate(model, z[0], t)
    err = np.linalg.norm(z_sim - z) / np.linalg.norm(z)
    assert err < 0.05, err


def test_extract_inject_roundtrip():
    rng = np.random.default_rng(1)
    spec = desmo.DesmoSpec(n=10, m=20, r=2, poly_order=2)
    params = desmo.init_params(spec)
    channels = sr.REFERENCE_CYLINDER_CHANNELS
    Z = sr.extract_channels(params, channels)
    assert Z.shape == (20, 5)
    z_new = rng.standard_normal((20, 5)).astype(np.float32)
    injected = sr.inject_channels(params, channels, z_new)
    Z2 = sr.extract_channels(injected, channels)
    np.testing.assert_allclose(Z2, z_new, rtol=1e-6)
    # untouched channels stay at init
    assert np.all(np.asarray(injected["z"][0]) == 1.0)
    assert np.all(np.asarray(injected["z_trig"][1]) == 1.0)  # cos untouched


def test_active_channels_from_energies():
    from desmo_tpu.sparsify import TermEnergies

    e = TermEnergies(
        poly=np.array([0.1, 5.0, 0.01]),
        trig=np.array([[2.0, 0.0], [0.0, 3.0], [0.5, 0.0]]),
    )
    ch = sr.active_channels(e, threshold=1.0)
    assert ("poly", 1) in ch and ("sin", 0) in ch and ("cos", 1) in ch
    assert len(ch) == 3


def test_pysr_gated():
    with pytest.raises(ImportError, match="PySR"):
        sr.fit_pysr(np.zeros((10, 2)), np.zeros((10, 2)))
