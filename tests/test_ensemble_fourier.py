"""Fourier-variant lane-packed ensemble: packed-vs-single parity + the
PACKED period multi-start (FFT candidates as per-seed period inits trained
to completion simultaneously, instead of runner.fourier_period_multistart's
sequential short probes)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desmo_tpu import configs, ensemble, train
from desmo_tpu.models import fourier


def _problem(S=3, n=64, m=48, r=2, P=2, nf=4, period_data=None, period_init=None,
             lr_omega=None):
    """Small Fourier problem; periodic data exactly representable by the
    series when period_data == period_init (mirrors test_fourier.py)."""
    period_init = float(m) if period_init is None else period_init
    period_data = period_init if period_data is None else period_data
    spec = fourier.FourierSpec(
        n=n, m=m, r=r, poly_order=P, omega_init=1.0, n_fourier=nf,
        period_init=period_init,
    )
    t = fourier.t_points(m)
    s = np.linspace(0, 2 * np.pi, n)
    x = np.outer(np.sin(s), np.sin(2 * np.pi * 2 * t / period_data)) + 0.5 * np.outer(
        np.cos(s), np.cos(2 * np.pi * 3 * t / period_data)
    )
    x = (x - x.mean(axis=1, keepdims=True)).astype(np.float32)
    from desmo_tpu import pod as pod_mod

    p = pod_mod.pod(x, r)
    cfg = configs.RunConfig(
        name="ens-fourier", variant="fourier", n=n, m=m, r=r, poly_order=P,
        n_fourier=nf, period_init=period_init,
        lr_omega=1.0 if lr_omega is None else lr_omega,
        num_epochs=1500, patience=400, sched_every=10, log_every=10_000,
        checkpoint_every=100_000,
    )
    params = ensemble.init_params(spec, S, seed=1, phi_sigma=0.1, omega_spread=0.2)
    batch = {"x": jnp.asarray(x), "pod_modes": jnp.asarray(np.asarray(p.modes))}
    return spec, cfg, params, batch


def test_init_params_fourier_periods():
    spec = fourier.FourierSpec(16, 12, 2, 2, n_fourier=3, period_init=12.0)
    p = ensemble.init_params(spec, 4, periods=[12.0, 5.0, 7.5])
    per = np.asarray(p["period"])
    assert per.shape[0] == 4
    np.testing.assert_allclose(per[:, 0], [12.0, 5.0, 7.5, 12.0])  # cycled
    np.testing.assert_allclose(np.asarray(p["trig_period"])[1], 5.0)
    # seed 0 otherwise keeps the exact reference init
    base = fourier.init_params(spec)
    for k in ("z", "z_trig", "c", "c_trig", "omega"):
        np.testing.assert_array_equal(np.asarray(p[k][0]), np.asarray(base[k]))
    from desmo_tpu.models import desmo

    with pytest.raises(ValueError, match="periods"):
        ensemble.init_params(desmo.DesmoSpec(16, 12, 2, 2), 2, periods=[1.0])


def test_packed_fourier_loss_matches_per_seed():
    S = 3
    spec, cfg, params, batch = _problem(S)
    loss = ensemble.build_loss(spec, cfg, S, method="factored")
    total, mets = loss(params, batch)
    single = fourier.build_loss(spec, cfg.beta, cfg.l1_lambda, method="factored")
    for s in range(S):
        t, ms = single(ensemble.extract_seed(params, s), batch)
        np.testing.assert_allclose(float(mets["rec"][s]), float(ms["rec"]), rtol=2e-5)
        np.testing.assert_allclose(float(mets["ortho"][s]), float(ms["ortho"]), rtol=2e-5)
        np.testing.assert_allclose(float(mets["l1"][s]), float(ms["l1"]), rtol=1e-6)
        np.testing.assert_allclose(float(mets["total_s"][s]), float(t), rtol=2e-5)
    np.testing.assert_allclose(float(total), float(jnp.sum(mets["total_s"])), rtol=1e-6)


def test_packed_fourier_grad_matches_per_seed():
    S = 3
    spec, cfg, params, batch = _problem(S)
    # distinct per-seed periods so the period gradients are seed-specific
    params = ensemble.init_params(
        spec, S, seed=1, phi_sigma=0.1, omega_spread=0.2,
        periods=[float(spec.m), 19.2, 30.0],
    )
    loss = ensemble.build_loss(spec, cfg, S, method="factored")
    single = fourier.build_loss(spec, cfg.beta, cfg.l1_lambda, method="factored")
    g = jax.grad(lambda p: loss(p, batch)[0])(params)
    for s in range(S):
        gs = jax.grad(lambda p: single(p, batch)[0])(
            ensemble.extract_seed(params, s)
        )
        for k in gs:
            np.testing.assert_allclose(
                np.asarray(g[k][s]), np.asarray(gs[k]),
                rtol=5e-4, atol=1e-5, err_msg=f"seed{s}:{k}",
            )


def test_trajectory_parity_fourier():
    """30 packed steps == 30 single-seed scanned steps, per seed (tame LRs)."""
    S = 2
    spec, cfg, params, batch = _problem(S, lr_omega=0.1)
    groups = fourier.param_groups(fourier.init_params(spec))
    loss = ensemble.build_loss(spec, cfg, S, method="factored")
    chunk = ensemble.make_ensemble_chunk(loss, groups, cfg, S)
    st = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    st, mets = chunk(st, batch, num_steps=30)
    single_loss = fourier.build_loss(spec, cfg.beta, cfg.l1_lambda, method="factored")
    schunk = train.make_train_chunk(single_loss, groups, cfg, unroll=1)
    for s in range(S):
        ss = jax.tree.map(
            jnp.array, train.init_state(ensemble.extract_seed(params, s), cfg)
        )
        ss, ms = schunk(ss, batch, num_steps=30)
        np.testing.assert_allclose(
            np.asarray(mets["total_s"])[:, s], np.asarray(ms["total"]),
            rtol=2e-4, atol=1e-6, err_msg=f"seed{s} trace",
        )
        for k in ss.params:
            np.testing.assert_allclose(
                np.asarray(st.params[k][s]), np.asarray(ss.params[k]),
                rtol=1e-3, atol=1e-5, err_msg=f"seed{s}:{k}",
            )
        np.testing.assert_allclose(
            np.asarray(st.sched.lrs[s]), np.asarray(ss.sched.lrs), rtol=1e-6
        )


def test_fit_packed_period_multistart_rescues_mismatch():
    """ensemble.fit with period_multistart > 1: the FFT candidates train as
    per-seed period inits SIMULTANEOUSLY; the winner must be a near-true-period
    seed and land within 2x of the oracle period-matched error — the packed
    form of test_fourier.py::test_period_multistart_rescues_mismatch."""
    spec, cfg, params, batch = _problem(
        4, period_data=48 / 2.5, period_init=48.0, m=48
    )
    cfg = dataclasses.replace(
        cfg, period_multistart=4, num_epochs=1500, checkpoint_every=500
    )
    logs = []
    result, best, finals = ensemble.fit(
        cfg, spec, batch, n_seeds=4, phi_sigma=0.02, log=logs.append,
    )
    assert any("period candidates" in line for line in logs)
    chosen = float(np.asarray(result.state.params["period"])[0])
    # the winner trained from a near-19.2 candidate, not the stalled init 48
    assert abs(chosen - 19.2) / 19.2 < 0.15, chosen
    assert best != 0  # seed 0 (reference init, period 48) is in the basin

    # oracle: matched init, same budget, single seed
    spec_m, cfg_m, _, batch_m = _problem(
        1, period_data=48 / 2.5, period_init=48 / 2.5, m=48
    )
    params_m = fourier.init_params(spec_m)
    loss_m = fourier.build_loss(spec_m, cfg_m.beta, cfg_m.l1_lambda, method="factored")
    res_m = train.fit(
        loss_m, fourier.param_groups(params_m), cfg_m, params_m, batch_m,
        log=None, chunk_size=500,
    )
    assert result.history["rec"][-1] < 2.0 * res_m.history["rec"][-1], (
        result.history["rec"][-1], res_m.history["rec"][-1])


def test_mesh_fourier_ensemble_matches_single_device():
    """Fourier multi-start under a device mesh: phi shards over 'space' (the
    small series coefficients stay replicated), per-seed trajectories match
    the unsharded packed chunk."""
    from desmo_tpu import parallel
    from desmo_tpu.parallel import make_mesh

    S = 3
    spec, cfg, params, batch = _problem(S, lr_omega=0.1)
    loss = ensemble.build_loss(spec, cfg, S, method="factored")
    groups = fourier.param_groups(fourier.init_params(spec))
    mesh = make_mesh(n_space=4, n_time=2)
    shardings = parallel.ensemble_param_shardings(params, mesh, cfg.m)
    assert "space" in str(shardings["phi"].spec)
    chunk_sh = ensemble.make_ensemble_chunk(
        loss, groups, cfg, S, param_shardings=shardings
    )
    with jax.sharding.set_mesh(mesh):
        batch_sh = parallel.shard_batch(batch, mesh)
        st_sh = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
        st_sh, m_sh = chunk_sh(st_sh, batch_sh, num_steps=15)

    chunk = ensemble.make_ensemble_chunk(loss, groups, cfg, S)
    st = jax.tree.map(jnp.array, ensemble.init_state(params, cfg, S))
    st, m = chunk(st, batch, num_steps=15)

    np.testing.assert_allclose(
        np.asarray(m_sh["total_s"]), np.asarray(m["total_s"]),
        rtol=5e-4, atol=1e-6,
    )
    for k in st.params:
        np.testing.assert_allclose(
            np.asarray(st_sh.params[k]), np.asarray(st.params[k]),
            rtol=5e-4, atol=1e-5, err_msg=k,
        )
    shard = next(iter(st_sh.params["phi"].addressable_shards))
    assert shard.data.shape == (S, spec.r, spec.n // 4)
