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


def test_full_sr_pipeline_on_trained_model():
    """Train a tiny DESMO on oscillatory data, then identify + reinject the
    dynamics: the simulated reconstruction must stay close to the trained one."""
    import jax.numpy as jnp

    from desmo_tpu import configs, pod, train
    from desmo_tpu.models import desmo as desmo_model

    n, m, r = 96, 200, 2
    s = np.linspace(0, 2 * np.pi, n)
    t = np.linspace(0, 8 * np.pi, m)
    x = np.outer(np.sin(s), np.sin(t)) + 0.6 * np.outer(np.cos(s), np.cos(t))
    x = (x - x.mean(axis=1, keepdims=True)).astype(np.float32)

    cfg = configs.RunConfig(
        name="sr",
        variant="desmo",
        n=n,
        m=m,
        r=r,
        poly_order=2,
        omega_init=1.0,
        lr_omega=1.0,
        beta=1e-3,
        l1_lambda=1e-4,
        num_epochs=2500,
        patience=600,
        sched_every=10,
        log_every=1000,
        checkpoint_every=10_000,
    )
    spec = desmo_model.DesmoSpec(n, m, r, 2, 1.0)
    p = pod.pod(x, r)
    params = desmo_model.init_params(spec)
    loss_fn = desmo_model.build_loss(spec, cfg.beta, cfg.l1_lambda)
    batch = {"x": jnp.asarray(x), "pod_modes": p.modes}
    res = train.fit(
        loss_fn, desmo_model.param_groups(params), cfg, params, batch, log=None, chunk_size=500
    )

    from desmo_tpu import sr as sr_mod

    out = sr_mod.identify_and_reinject(
        res.state.params,
        batch,
        spec,
        energy_threshold=None or 0.5,
        degree=1,
        stlsq_threshold=1e-3,
        stlsq_alpha=1e-6,
    )
    assert out.error_original < 0.2
    # simulated dynamics should not blow up the reconstruction
    assert out.error_simulated < max(3 * out.error_original, 0.3), (
        out.error_original,
        out.error_simulated,
    )
    assert len(out.equations) == out.z_data.shape[1]


def test_pysr_gated():
    with pytest.raises(ImportError, match="PySR"):
        sr.fit_pysr(np.zeros((10, 2)), np.zeros((10, 2)))
